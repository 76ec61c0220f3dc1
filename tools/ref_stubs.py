"""Minimal stubs for the reference's external deps (basicsr, torchstat,
timm) so its model files can be imported and *run* as golden oracles.

Only behavior exercised by the reference's forward passes is implemented:
  * basicsr.archs.arch_util.flow_warp — standard optical-flow bilinear warp
    (grid_sample with align_corners=True), as documented by basicsr;
  * basicsr.utils.registry.ARCH_REGISTRY — no-op register decorator;
  * timm DropPath (identity in eval) / to_2tuple / trunc_normal_;
  * torchstat.stat — unused at runtime, no-op.

Call install() before importing reference net modules.
"""

import sys
import types


def install():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # --- torchstat ---
    torchstat = types.ModuleType("torchstat")
    torchstat.stat = lambda *a, **k: None
    sys.modules.setdefault("torchstat", torchstat)

    # --- basicsr ---
    def flow_warp(x, flow, interp_mode="bilinear", padding_mode="zeros",
                  align_corners=True):
        n, c, h, w = x.size()
        grid_y, grid_x = torch.meshgrid(
            torch.arange(0, h, dtype=x.dtype, device=x.device),
            torch.arange(0, w, dtype=x.dtype, device=x.device),
            indexing="ij",
        )
        grid = torch.stack((grid_x, grid_y), 2)  # (h, w, 2)
        vgrid = grid.unsqueeze(0) + flow
        vgrid_x = 2.0 * vgrid[:, :, :, 0] / max(w - 1, 1) - 1.0
        vgrid_y = 2.0 * vgrid[:, :, :, 1] / max(h - 1, 1) - 1.0
        vgrid_scaled = torch.stack((vgrid_x, vgrid_y), dim=3)
        return F.grid_sample(
            x, vgrid_scaled, mode=interp_mode, padding_mode=padding_mode,
            align_corners=align_corners,
        )

    class _Registry:
        def register(self, *a, **k):
            def deco(cls):
                return cls

            return deco(a[0]) if a and callable(a[0]) else deco

    basicsr = types.ModuleType("basicsr")
    archs = types.ModuleType("basicsr.archs")
    arch_util = types.ModuleType("basicsr.archs.arch_util")
    arch_util.flow_warp = flow_warp

    class LayerNorm2d(nn.Module):  # nafnet.py import; GroupNorm(1) flavor
        def __init__(self, channels, eps=1e-6):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(channels))
            self.bias = nn.Parameter(torch.zeros(channels))
            self.eps = eps

        def forward(self, x):
            mu = x.mean(1, keepdim=True)
            var = (x - mu).pow(2).mean(1, keepdim=True)
            y = (x - mu) / (var + self.eps).sqrt()
            return self.weight.view(1, -1, 1, 1) * y + self.bias.view(
                1, -1, 1, 1
            )

    class Local_Base:
        def convert(self, *a, **k):
            pass

    arch_util.LayerNorm2d = LayerNorm2d
    arch_util.Local_Base = Local_Base
    utils = types.ModuleType("basicsr.utils")
    registry = types.ModuleType("basicsr.utils.registry")
    registry.ARCH_REGISTRY = _Registry()
    utils.registry = registry
    basicsr.archs = archs
    basicsr.utils = utils
    archs.arch_util = arch_util
    sys.modules.setdefault("basicsr", basicsr)
    sys.modules.setdefault("basicsr.archs", archs)
    sys.modules.setdefault("basicsr.archs.arch_util", arch_util)
    sys.modules.setdefault("basicsr.utils", utils)
    sys.modules.setdefault("basicsr.utils.registry", registry)
    # nafnet.py does `from basicsr.models.archs.arch_util import ...` in
    # some versions; cover the archs path used by the reference
    models_mod = types.ModuleType("basicsr.models")
    models_archs = types.ModuleType("basicsr.models.archs")
    models_archs.__path__ = []  # mark as package for submodule imports
    models_arch_util = arch_util
    local_arch = types.ModuleType("basicsr.models.archs.local_arch")
    local_arch.Local_Base = Local_Base
    models_mod.archs = models_archs
    models_archs.arch_util = models_arch_util
    models_archs.local_arch = local_arch
    sys.modules.setdefault("basicsr.models", models_mod)
    sys.modules.setdefault("basicsr.models.archs", models_archs)
    sys.modules.setdefault("basicsr.models.archs.arch_util", models_arch_util)
    sys.modules.setdefault("basicsr.models.archs.local_arch", local_arch)

    # --- timm ---
    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std + mean, b * std + mean)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            mask.floor_()
            return x.div(keep) * mask

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)
