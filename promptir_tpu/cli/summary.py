"""Model complexity accounting CLI (params / FLOPs / bytes / memory).

The framework's version of the reference's per-model __main__ smoke blocks
and utils_modelsummary counters (/root/reference/net/model.py:383-403):
numbers come from XLA's own cost analysis of the compiled forward.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="model complexity summary")
    p.add_argument("--model", default="promptir")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--num_blocks", type=int, nargs=4, default=None)
    args = p.parse_args(argv)

    from promptir_tpu.models import create_model
    from promptir_tpu.utils.flops import summarize

    kw = {}
    if args.num_blocks is not None:
        kw["num_blocks"] = tuple(args.num_blocks)
    model = create_model(args.model, **kw)
    print(f"{args.model} @ {args.batch}x{args.size}x{args.size}x3")
    print(summarize(model, (args.batch, args.size, args.size, 3)))


if __name__ == "__main__":
    main()
