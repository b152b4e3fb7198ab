"""Import the torch reference model (read-only, /root/reference) on CPU.

The reference's CUDA selective-scan extension is replaced by a pure-torch
differentiable recurrence with the exact kernel semantics
(`/root/reference/models/encoders/selective_scan/selective_scan_interface.py
:86-131`): h_t = exp(softplus(dt+bias)*A) h_{t-1} + softplus(dt+bias) B_t u_t,
y_t = <C_t, h_t> + D u_t. This makes the whole torch Sigma model runnable
without CUDA, so converter + numerics can be validated end to end.

Missing third-party deps (timm, fvcore, the selective_scan pip pkg) are
stubbed with minimal equivalents before the reference modules import them.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn.functional as F

REF_ROOT = "/root/reference"


def pure_selective_scan(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False, nrows=1
):
    """Differentiable pure-torch selective scan (reference semantics).

    u/delta: (b, d, l); A: (d, n); B/C: (b, n, l) or (b, g, n, l);
    D: (d,); delta_bias: (d,). Returns y (b, d, l) in u's dtype.
    """
    if B.dim() == 3:
        B = B.unsqueeze(1)
    if C.dim() == 3:
        C = C.unsqueeze(1)
    b, d, l = u.shape
    g, n = B.shape[1], B.shape[2]
    dtype_in = u.dtype
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias.float()[None, :, None]
    if delta_softplus:
        delta = F.softplus(delta)
    rep = d // g
    Bx = B.float().repeat_interleave(rep, dim=1)  # (b, d, n, l)
    Cx = C.float().repeat_interleave(rep, dim=1)
    dA = torch.exp(delta.unsqueeze(2) * A.float()[None, :, :, None])
    dBu = delta.unsqueeze(2) * Bx * u.unsqueeze(2)
    x = u.new_zeros(b, d, n)
    ys = []
    for t in range(l):
        x = dA[..., t] * x + dBu[..., t]
        ys.append((x * Cx[..., t]).sum(-1))
    y = torch.stack(ys, dim=-1)
    if D is not None:
        y = y + D.float()[None, :, None] * u
    return y.to(dtype_in)


class _PureSelectiveScanFn:
    """Drop-in for the reference's `SelectiveScan` autograd binding
    (vmamba.py:34-78): .apply with the CUDA-kernel calling convention."""

    @staticmethod
    def apply(u, delta, A, B, C, D=None, delta_bias=None,
              delta_softplus=False, nrows=1):
        return pure_selective_scan(
            u, delta, A, B, C, D, delta_bias, delta_softplus
        )


def _install_stubs():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0, scale_by_keep=True):
                super().__init__()
                self.drop_prob = drop_prob
                self.scale_by_keep = scale_by_keep

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                if self.scale_by_keep:
                    mask = mask / keep
                return x * mask

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
            return tensor

        def to_2tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        layers.to_2tuple = to_2tuple
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "fvcore" not in sys.modules:
        fvcore = types.ModuleType("fvcore")
        fnn = types.ModuleType("fvcore.nn")
        fnn.FlopCountAnalysis = lambda *a, **k: None
        fnn.flop_count_str = lambda *a, **k: ""
        fnn.flop_count = lambda *a, **k: ({}, {})
        fnn.parameter_count = lambda *a, **k: {}
        fvcore.nn = fnn
        sys.modules["fvcore"] = fvcore
        sys.modules["fvcore.nn"] = fnn

    if "selective_scan" not in sys.modules:
        ss = types.ModuleType("selective_scan")
        ss.selective_scan_fn = pure_selective_scan
        sys.modules["selective_scan"] = ss

    if "selective_scan_cuda_core" not in sys.modules:
        cuda = types.ModuleType("selective_scan_cuda_core")

        def _no_cuda(*a, **k):  # pragma: no cover
            raise RuntimeError(
                "CUDA kernel stub called; SelectiveScan should be patched"
            )

        cuda.fwd = _no_cuda
        cuda.bwd = _no_cuda
        sys.modules["selective_scan_cuda_core"] = cuda


_cache = {}


def load_reference():
    """Import and return the reference model modules (cached).

    Returns a namespace with .vmamba, .dual_vmamba, .mamba_decoder,
    .builder modules, all using the pure-torch scan."""
    if "ns" in _cache:
        return _cache["ns"]
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import models.encoders.vmamba as vmamba  # noqa: E402

    # route every scan through the differentiable pure-torch recurrence
    vmamba.SelectiveScan = _PureSelectiveScanFn
    vmamba.selective_scan_fn_v1 = pure_selective_scan

    import models.builder as builder  # noqa: E402
    import models.decoders.MambaDecoder as mamba_decoder  # noqa: E402
    import models.encoders.dual_vmamba as dual_vmamba  # noqa: E402

    ns = types.SimpleNamespace(
        vmamba=vmamba,
        dual_vmamba=dual_vmamba,
        mamba_decoder=mamba_decoder,
        builder=builder,
    )
    _cache["ns"] = ns
    return ns
