"""Demo CLI — arbitrary-resolution inference on a file or directory.

Parity with /root/reference/demo.py:79-127: `--test_path` (file or dir),
`--output_path`, `--tile/--tile_size/--tile_overlap`; reflect-pad to a
multiple of 8 for the non-tiled path (demo.py:17-24), overlap-blend tiling
for the tiled path (demo.py:26-48) — here compiled and batched.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="promptir_tpu demo inference")
    p.add_argument("--test_path", required=True)
    p.add_argument("--output_path", default="output/demo/")
    p.add_argument("--model", default="promptir")
    p.add_argument("--ckpt_name", default=None)
    p.add_argument("--tile", action="store_true")
    p.add_argument("--tile_size", type=int, default=128)
    p.add_argument("--tile_overlap", type=int, default=32)
    p.add_argument("--tile_chunk", type=int, default=8)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--num_blocks", type=int, nargs=4, default=None)
    p.add_argument("--num_refinement_blocks", type=int, default=None)
    p.add_argument(
        "--fused", action="store_true",
        help="fused Pallas transformer-block kernels (TPU)",
    )
    p.add_argument(
        "--mesh", action="store_true",
        help="shard the tile batch over all devices (multi-chip tiling)",
    )
    p.add_argument(
        "--spatial", action="store_true",
        help="shard each image's H axis over all devices with exact "
             "in-model collectives (parallel/spatial.py) — one image, "
             "all chips, bit-identical to single-chip output",
    )
    return p


def model_kwargs(args):
    import jax.numpy as jnp

    kw = {"dtype": jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32}
    if getattr(args, "num_blocks", None) is not None:
        kw["num_blocks"] = tuple(args.num_blocks)
    if getattr(args, "num_refinement_blocks", None) is not None:
        kw["num_refinement_blocks"] = args.num_refinement_blocks
    if getattr(args, "fused", False):
        kw["fused_ffn"] = True
    return kw


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from promptir_tpu.cli.test import load_params
    from promptir_tpu.data.datasets import TestSpecificDataset
    from promptir_tpu.eval.padding import pad_to_multiple_reflect
    from promptir_tpu.eval.tiling import tiled_inference
    from promptir_tpu.models import create_model
    from promptir_tpu.parallel.spatial import pad_bases
    from promptir_tpu.utils.compile_cache import enable_persistent_cache
    from promptir_tpu.utils.image_io import save_image

    if args.tile and args.spatial:
        raise SystemExit(
            "--tile and --spatial are mutually exclusive: tiled "
            "overlap-blending is approximate at seams, --spatial is the "
            "exact multi-chip path (use --tile --mesh for sharded tiling)"
        )
    if args.spatial and getattr(args, "fused", False):
        raise SystemExit(
            "--spatial needs the unfused op path (drop --fused): "
            "the Pallas kernels are single-chip"
        )
    # exactness is proven (tests/test_halo.py) for every family: the
    # MDTA/GDFN/OCAB/prompt/Easy/NAF op sets run halo-local with psummed
    # statistics; the Uformer shifted windows roll across shards via a
    # ring ppermute; the CAMixer mixers and the TLC pool take the exact
    # gather fallback (their routing decisions are global)
    SPATIAL_MODELS = {
        "promptir", "xrestormerir", "promptxrestormerir",
        "promptxrestormereffir", "easypromptxrestormer", "nafnet",
        "nafnetlocal", "promptuformerir", "capromptxrestormereff",
        "capromptxrestormereffv2", "catapromptxrestormer",
        "capromptuformerir",
    }
    if args.spatial and args.model not in SPATIAL_MODELS:
        raise SystemExit(
            f"--spatial supports {sorted(SPATIAL_MODELS)} (validated "
            "exact); use --tile --mesh for other models"
        )

    enable_persistent_cache()
    model = create_model(args.model, **model_kwargs(args))
    from promptir_tpu.cli.test import validation_shape

    params = load_params(
        model, args.ckpt_name, sample_shape=validation_shape(args.model)
    )

    mesh = None
    if args.mesh:
        from promptir_tpu.parallel.mesh import create_mesh, replicated

        mesh = create_mesh()
        params = jax.device_put(params, replicated(mesh))

    smesh = None
    if args.spatial:
        from promptir_tpu.parallel.mesh import create_mesh, replicated

        smesh = create_mesh()
        # place the replicated params once; the per-image device_put in
        # spatial_sharded_apply is then a no-op instead of a ~140MB
        # re-broadcast per image
        params = jax.device_put(params, replicated(smesh))

    @jax.jit
    def model_fn(p, x):
        return model.apply({"params": p}, x)

    os.makedirs(args.output_path, exist_ok=True)
    ds = TestSpecificDataset(args.test_path)
    for i in range(len(ds)):
        name, img = ds.get(i)
        x = jnp.asarray(img[None])
        h, w = img.shape[:2]
        if args.tile:
            y = tiled_inference(
                model_fn,
                params,
                x,
                tile=args.tile_size,
                overlap=args.tile_overlap,
                chunk=args.tile_chunk,
                mesh=mesh,
            )
        elif args.spatial:
            from promptir_tpu.parallel.spatial import spatial_sharded_apply

            n = smesh.shape["data"]
            # per-family (H, W) bases: window alignment at every U-Net
            # level + even stripes per shard (parallel/spatial.py)
            base = pad_bases(args.model, n)
            try:
                xp = pad_to_multiple_reflect(x, base)
            except ValueError:
                # reflect needs pad < dim; tiny images fall back to
                # symmetric (duplicated-edge) padding — cropped off anyway
                from promptir_tpu.eval.padding import target_size

                th_, tw_ = target_size(h, w, base)
                xp = jnp.pad(
                    x, ((0, 0), (0, th_ - h), (0, tw_ - w), (0, 0)),
                    mode="symmetric",
                )
            y = spatial_sharded_apply(
                lambda p, t: model.apply({"params": p}, t), params, xp,
                smesh,
            )
            y = jnp.clip(y[:, :h, :w, :], 0.0, 1.0)
        else:
            # the reference pads to 8 (demo.py:17-24) which only covers
            # window-free PromptIR; windowed families need their levels'
            # grids window-aligned too
            xp = pad_to_multiple_reflect(x, pad_bases(args.model))
            y = jnp.clip(model_fn(params, xp)[:, :h, :w, :], 0.0, 1.0)
        out = os.path.join(args.output_path, f"{name}.png")
        save_image(out, np.asarray(y[0]))
        print(f"{name}: {img.shape[1]}x{img.shape[0]} -> {out}")


if __name__ == "__main__":
    main()
