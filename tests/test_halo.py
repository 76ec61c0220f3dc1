"""Halo-exchange spatial sharding tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from promptir_tpu.models import create_model
from promptir_tpu.parallel.halo import exchange_halo, spatial_sharded_forward
from promptir_tpu.parallel.mesh import create_mesh


def test_exchange_halo_reassembles_neighbors():
    mesh = create_mesh()
    n = 8
    h_local = 4
    halo = 2
    x = jnp.arange(n * h_local, dtype=jnp.float32).reshape(1, n * h_local, 1, 1)
    x = jnp.broadcast_to(x, (1, n * h_local, 3, 1))

    def f(xs):
        return exchange_halo(xs, halo, "data", border="reflect")

    fn = jax.shard_map(
        f, mesh=mesh, in_specs=P(None, "data"), out_specs=P(None, "data"),
        check_vma=False,
    )
    y = np.asarray(fn(x))  # (1, n*(h+2*halo), 3, 1)
    y = y.reshape(n, h_local + 2 * halo, 3)[:, :, 0]

    # interior shard 3: rows [12..15], halo = rows 10,11 above and 16,17 below
    np.testing.assert_array_equal(
        y[3], np.array([10, 11, 12, 13, 14, 15, 16, 17], np.float32)
    )
    # first shard: reflect-padded top (rows 2,1), real bottom halo 4,5
    np.testing.assert_array_equal(
        y[0], np.array([2, 1, 0, 1, 2, 3, 4, 5], np.float32)
    )
    # last shard: real top halo, reflected bottom
    np.testing.assert_array_equal(
        y[7], np.array([26, 27, 28, 29, 30, 31, 30, 29], np.float32)
    )


@pytest.mark.slow
def test_spatial_sharded_apply_promptir_exact():
    """EXACT multi-chip inference of the REAL U-Net (full PromptIR wiring:
    prompts, MDTA global stats, 3 down/upsample levels, asymmetric
    decoder) via in-model collectives (parallel/spatial.py): every shard's
    output must match the single-device forward everywhere — including
    seams and global borders — to float tolerance (psum reassociation)."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "promptir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1
    )
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(1, 128, 64, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def fn(p, xs):
        return model.apply(p, xs)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_spatial_sharded_ocab_exact():
    """Sharded OCAB: k/v halo rows come from neighbors over ppermute
    (zeros at global borders) — must equal the unsharded op exactly."""
    from promptir_tpu.ops.ocab import OCAB
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    m = OCAB(dim=16, window_size=8, overlap_ratio=0.5, num_heads=2)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 64, 32, 16)).astype(np.float32)
    )
    params = m.init(jax.random.PRNGKey(0), x)
    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(
        lambda p, t: m.apply(p, t), params, x, mesh
    )
    y_ref = m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_spatial_sharded_apply_promptxrestormer_exact():
    """Exact multi-chip forward of the X-Restormer family U-Net (OCAB
    spatial attention + PromptXBlock prompts): every level's stripes stay
    window-aligned at H=512 over 8 shards."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "promptxrestormerir", num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1,
    )
    x = jnp.asarray(
        np.random.default_rng(4).uniform(size=(1, 512, 64, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def fn(p, xs):
        return model.apply(p, xs)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=5e-5, atol=5e-5
    )


@pytest.mark.slow
def test_spatial_sharded_nafnet_exact():
    """NAFNet sharded: non-overlapping 2x2/s2 downs are shard-local, the
    SCA global pool becomes a pmean — exact vs single-chip."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "nafnet", width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
        dec_blk_nums=(1, 1),
    )
    x = jnp.asarray(
        np.random.default_rng(5).uniform(size=(1, 64, 32, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(
        lambda p, t: model.apply(p, t), params, x, mesh
    )
    y_ref = model.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_spatial_sharded_easy_promptxrestormer_exact():
    """All-cheap family sharded: Easy blocks (SCA pmean, conv halos) +
    PromptGen pmean — exact vs single-chip."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "easypromptxrestormer", num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1,
    )
    x = jnp.asarray(
        np.random.default_rng(6).uniform(size=(1, 64, 32, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(
        lambda p, t: model.apply(p, t), params, x, mesh
    )
    y_ref = model.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


def test_sharding_guards_fail_loudly():
    """When no exact sharded plan exists the trace must raise, not
    silently compute wrong seams: a gathered conv whose global output
    rows cannot be re-partitioned over the mesh axis."""
    from promptir_tpu.ops.conv import Conv as HaloConv
    from promptir_tpu.parallel.spatial import spatial_sharding

    # stride-2 SAME conv on global H=8 over 8 shards: gathered H_out=4
    c = HaloConv(4, (3, 3), strides=(2, 2), padding="SAME")
    x = jnp.zeros((1, 8, 8, 3))
    p = c.init(jax.random.PRNGKey(0), x)
    mesh = create_mesh()

    def f(params, xs):
        with spatial_sharding("data"):
            return c.apply(params, xs)

    fn = jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    with pytest.raises(NotImplementedError, match="partition"):
        fn(p, x)


@pytest.mark.slow
def test_spatial_sharded_tlc_pool_exact():
    """The TLC local pool (NAFNetLocal) has ~half-image windows — no
    local halo plan; the exact gather fallback must match unsharded."""
    from promptir_tpu.ops.easy import NAFBlock
    from promptir_tpu.parallel.spatial import spatial_sharding

    m = NAFBlock(dim=8, tlc_kernel=(8, 8))
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(1, 16, 16, 8)).astype(np.float32)
    )
    p = m.init(jax.random.PRNGKey(0), x)
    y_ref = m.apply(p, x)
    mesh = create_mesh()

    def f(params, xs):
        with spatial_sharding("data"):
            return m.apply(params, xs)

    fn = jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    np.testing.assert_allclose(
        np.asarray(fn(p, x)), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )


def test_spatial_sharded_strided_conv_exact():
    """The Uformer 4x4/s2/p1 downsample conv under sharding: ph-row halo
    + row-VALID strided conv must be bit-exact vs unsharded (k == s+2p,
    local rows divide the stride)."""
    from promptir_tpu.ops.conv import Conv as HaloConv
    from promptir_tpu.parallel.spatial import spatial_sharding

    c = HaloConv(8, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 32, 16, 4)).astype(np.float32)
    )
    p = c.init(jax.random.PRNGKey(2), x)
    y_ref = c.apply(p, x)

    mesh = create_mesh()

    def f(params, xs):
        with spatial_sharding("data"):
            return c.apply(params, xs)

    fn = jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    y = fn(p, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )


def test_spatial_sharded_gather_fallback_conv_exact():
    """A conv with no halo plan (kernel dilation) must take the exact
    gather -> full conv -> local-slice fallback, not compute wrong seams."""
    from promptir_tpu.ops.conv import Conv as HaloConv
    from promptir_tpu.parallel.spatial import spatial_sharding

    c = HaloConv(6, (3, 3), padding="SAME", kernel_dilation=(2, 2))
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, 16, 8, 3)).astype(np.float32)
    )
    p = c.init(jax.random.PRNGKey(3), x)
    y_ref = c.apply(p, x)

    mesh = create_mesh()

    def f(params, xs):
        with spatial_sharding("data"):
            return c.apply(params, xs)

    fn = jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    y = fn(p, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )


def test_sharded_roll_h_matches_global_roll():
    """sharded_roll_h == jnp.roll on the assembled global tensor, both
    directions, wrap-around included."""
    from promptir_tpu.parallel.spatial import sharded_roll_h

    mesh = create_mesh()
    x = jnp.arange(8 * 4 * 2 * 3, dtype=jnp.float32).reshape(1, 32, 2, 3)

    for shift in (-3, -1, 1, 4):
        fn = jax.shard_map(
            lambda xs: sharded_roll_h(xs, shift, "data"),
            mesh=mesh, in_specs=P(None, "data"), out_specs=P(None, "data"),
            check_vma=False,
        )
        np.testing.assert_array_equal(
            np.asarray(fn(x)), np.asarray(jnp.roll(x, shift, axis=1))
        )


@pytest.mark.slow
def test_spatial_sharded_sr_scale_exact():
    """SR mode (scale=2) sharded: the input upscale resizes the 3-channel
    image at GLOBAL row coordinates (gather -> bilinear -> re-slice),
    then the normal sharded U-Net runs on the upscaled stripes."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "xrestormerir", num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        scale=2,
    )
    x = jnp.asarray(
        np.random.default_rng(14).uniform(size=(1, 256, 32, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def fn(p, xs):
        return model.apply(p, xs)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=5e-5, atol=5e-5
    )


@pytest.mark.slow
def test_spatial_sharded_camixer_v1_exact():
    """CAMixer family (v1: flow_warp deformable keys, Gumbel/top-k window
    routing) sharded: the mixers take the exact gather fallback (global
    routing decisions), the condition pyramid resizes at global row
    coordinates, everything else runs halo-local."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "capromptxrestormereff", dim=16, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=0.5,
    )
    x = jnp.asarray(
        np.random.default_rng(12).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x, True)

    def fn(p, xs):
        return model.apply(p, xs, True)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=5e-5, atol=5e-5
    )


@pytest.mark.slow
def test_spatial_sharded_cata_exact():
    """CATA sharded: per-image BranchSelector routing (pmean'd squeeze ->
    replicated scores), CAMixer v2 gather fallback, Easy-block SCA pmean."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "catapromptxrestormer", dim=16, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, ratio=0.5, hard_ratio=0.5,
    )
    x = jnp.asarray(
        np.random.default_rng(13).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x, True)

    def fn(p, xs):
        return model.apply(p, xs, True)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=5e-5, atol=5e-5
    )


@pytest.mark.slow
def test_spatial_sharded_ca_uformer_exact():
    """CAPromptUformerIR sharded: CAMixer-v1 token blocks (gather
    fallback) inside the Uformer skeleton (strided-plan downsamples,
    local transposed-conv upsamples, prompt GAP pmean)."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "capromptuformerir", embed_dim=8, depths=(1,) * 9, ratio=0.5,
    )
    x = jnp.asarray(
        np.random.default_rng(15).uniform(
            size=(1, 128, 128, 3)
        ).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x, True)

    def fn(p, xs):
        return model.apply(p, xs, True)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=5e-5, atol=5e-5
    )


@pytest.mark.slow
def test_spatial_sharded_uformer_exact():
    """Exact multi-chip forward of the 9-stage PromptUformerIR: shifted
    windows cross stripe seams (sharded cyclic roll + global-mask row
    slices), the 4x4/s2 downsamples use the strided halo plan, deep
    levels whose stripes are thinner than a window take the gather
    fallback, and the prompt GAP/resize stay global."""
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    model = create_model(
        "promptuformerir",
        embed_dim=8,
        win_size=4,
        depths=(2, 2, 2, 1, 1, 1, 2, 2, 2),
        num_heads=(1, 2, 4, 8, 16, 16, 8, 4, 2),
    )
    x = jnp.asarray(
        np.random.default_rng(9).uniform(size=(1, 128, 64, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def fn(p, xs):
        return model.apply(p, xs)

    mesh = create_mesh()
    y_sharded = spatial_sharded_apply(fn, params, x, mesh)
    y_ref = fn(params, x)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_ref), rtol=5e-5, atol=5e-5
    )


def test_spatial_sharded_apply_rejects_bad_height():
    from promptir_tpu.parallel.spatial import spatial_sharded_apply

    mesh = create_mesh()
    with pytest.raises(AssertionError, match="divisible"):
        spatial_sharded_apply(
            lambda p, t: t, None, jnp.zeros((1, 72, 16, 3)), mesh
        )


@pytest.mark.slow
def test_spatial_sharded_forward_matches_unsharded():
    """With a halo covering the receptive field, the sharded forward must
    equal the single-device forward away from seams; with a conv-only
    model it is exact everywhere."""
    import flax.linen as nn

    class SmallConvNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(3, (3, 3), padding="SAME")(x)
            return x

    model = SmallConvNet()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 64, 16, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)

    def fn(p, xs):
        return model.apply(p, xs)

    mesh = create_mesh()
    # receptive field of two 3x3 convs = 5 -> halo 4 is enough
    y_sharded = spatial_sharded_forward(fn, params, x, mesh, halo=4)
    y_ref = fn(params, x)
    # interior (every seam) is exact; only the global border rows (within
    # the receptive field of the image edge) differ, because a stripe edge
    # cannot reproduce the unsharded zero-pad exactly
    np.testing.assert_allclose(
        np.asarray(y_sharded)[:, 2:-2], np.asarray(y_ref)[:, 2:-2],
        rtol=1e-6, atol=1e-6,
    )

    # end-to-end exactness: pre-pad the global image (as the eval pipeline
    # does), shard, crop — the border effect lands in the padding
    xp = jnp.pad(x, ((0, 0), (8, 8), (0, 0), (0, 0)), mode="reflect")
    yp = spatial_sharded_forward(fn, params, xp, mesh, halo=4)
    yp_ref = fn(params, xp)
    np.testing.assert_allclose(
        np.asarray(yp)[:, 8:-8], np.asarray(yp_ref)[:, 8:-8],
        rtol=1e-6, atol=1e-6,
    )


def test_pad_bases_per_family():
    """Demo pre-pad bases (parallel/spatial.py:pad_bases) must make every
    U-Net level window-aligned and every shard stripe even — the
    window-free reference pad-to-8 (demo.py:17-24) breaks OCAB/CAMixer/
    Uformer families whose level grids reshape by 8x8 windows."""
    from promptir_tpu.parallel.spatial import pad_bases

    for n in (1, 2, 4, 8):
        for name, levels, win_sharded in [
            ("promptir", 3, False),
            ("easypromptxrestormer", 3, False),
            ("nafnet", 3, False),
            ("xrestormerir", 3, True),
            ("promptxrestormerir", 3, True),
            ("promptxrestormereffir", 3, True),
            ("capromptxrestormereff", 3, False),
            ("catapromptxrestormer", 3, False),
            ("promptuformerir", 4, False),
            ("capromptuformerir", 4, False),
        ]:
            bh, bw = pad_bases(name, n)
            # stripes stay even through every downsample level
            assert bh % (2**levels * n) == 0, (name, n, bh)
            windowed = win_sharded or name not in (
                "promptir", "easypromptxrestormer", "nafnet"
            )
            if windowed:
                # global grids stay 8x8-window-aligned at the deepest level
                assert bh % (8 * 2**levels) == 0, (name, n, bh)
                assert bw % (8 * 2**levels) == 0, (name, n, bw)
            if win_sharded:
                # sharded OCAB windows each stripe locally (ops/ocab.py
                # asserts stripe_h % win == 0 at every level)
                assert (bh // (2**levels * n)) % 8 == 0, (name, n, bh)
    # n=1 bases are the single-chip demo pads; PromptIR keeps the
    # reference's 8 exactly
    assert pad_bases("promptir") == (8, 8)
