"""Checkpoint conversion CLI: PyTorch/Lightning .ckpt -> native .npz params.

Converts the reference's released all-in-one checkpoint
(/root/reference/ckpt/README.md:1) or any compatible state dict into this
framework's flat .npz param format, verifying every path/shape against the
target model first.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="torch ckpt -> npz converter")
    p.add_argument("input", help=".ckpt/.pt/.pth file")
    p.add_argument("output", help="output .npz path")
    p.add_argument("--model", default="promptir")
    p.add_argument("--num_blocks", type=int, nargs=4, default=None)
    p.add_argument("--skip_check", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from promptir_tpu.compat.torch_ckpt import (
        check_params_match,
        convert_state_dict,
        load_torch_state_dict,
    )
    from promptir_tpu.models import create_model
    from promptir_tpu.train.checkpoints import save_params_npz

    sd = load_torch_state_dict(args.input)
    print(f"loaded {len(sd)} tensors from {args.input}")
    variables = convert_state_dict(sd)

    if not args.skip_check:
        kw = {}
        if args.num_blocks is not None:
            kw["num_blocks"] = tuple(args.num_blocks)
        from promptir_tpu.cli.test import validation_shape

        model = create_model(args.model, **kw)
        init = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros(validation_shape(args.model))
            )
        )
        check_params_match(variables, init)
        print("all param paths and shapes match the model")

    save_params_npz(args.output, variables["params"])
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
