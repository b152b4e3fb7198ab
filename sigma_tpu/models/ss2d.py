"""SS2D and multimodal selective-scan modules.

TPU re-design of the reference ops (all channel-last, single batched scan
call per module instead of per-direction kernel launches):

  * `SS2D`            — 4-direction 2-D selective scan block
                        (reference `vmamba.py:640-1089`, core
                        `cross_selective_scan` `vmamba.py:165-226`).
  * `ConMBSS2D`       — concat-sequence multimodal scan with SE cross-gating
                        (reference `ConMB_SS2D`, `vmamba.py:1092-1284`,
                        core k2 `vmamba.py:369-430`).
  * `CrossMambaFusionSS2D` — cross-modal 1-D scans with swapped C matrices
                        (reference `CrossMambaFusion_SS2D_SSM` +
                        `Cross_Mamba_Attention_SSM`, `vmamba.py:1407-1640`).

All K scan directions / modalities are merged into the channel dimension of
one `selective_scan` call with G = K B/C-groups, matching the reference's
merged-K kernel invocation while giving XLA one big fused region.
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import (
    LN_EPS,
    a_log_init,
    depthwise_conv3x3,
    dt_proj_bias_init,
    dt_proj_kernel_init,
    torch_linear_kernel_init,
    trunc_normal_init,
)
from sigma_tpu.ops import selective_scan_cl
from sigma_tpu.ops.pallas_merge_ln_gate import merge_ln_gate
from sigma_tpu.ops.pallas_scan_g import (
    selective_scan_g,
    selective_scan_g_proj,
    selective_scan_g_proj_ml,
)

Dtype = Any

# Fused SS2D epilogue (merge + out_norm + silu gate in one Pallas pass,
# ops/pallas_merge_ln_gate.py) on TPU. MEASURED SLOWER than XLA's own
# fusion of the chain and therefore OFF by default: fwd 43.2 -> 41.7
# img/s at b8 bf16, tile-shape-insensitive — XLA's relayout + LN + gate
# fusions (each at 350-670 GB/s) already overlap better than one Pallas
# pass with an in-VMEM transpose. Kept (with full parity tests) as the
# springboard for an epilogue that also absorbs out_proj on the MXU.
# Read once at import (jit caches bake it in).
_FUSED_EPILOGUE = os.environ.get("SIGMA_FUSED_EPILOGUE", "0") != "0"


class _LNParams(nn.Module):
    """LayerNorm affine params only — param tree identical to
    nn.LayerNorm ({scale, bias}) so the fused-epilogue path shares
    checkpoints with the unfused one."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def _auto(v, d_model, div):
    return math.ceil(d_model / div) if v == "auto" else v


def _linear_init(mode: str, fan_in: int):
    if mode == "trunc_normal":
        return trunc_normal_init(0.02)
    return torch_linear_kernel_init(fan_in)


class _SSMDirParams(nn.Module):
    """Per-direction projection / SSM parameters shared by SS2D variants.

    Shapes (JAX layout; the torch->jax converter transposes accordingly):
      x_proj_weight:   (K, d_inner, dt_rank + 2N)
      dt_projs_weight: (K, dt_rank, d_inner)
      dt_projs_bias:   (K, d_inner)
      A_logs:          (K * d_inner, N)
      Ds:              (K * d_inner,)
    """

    k: int
    d_inner: int
    d_state: int
    dt_rank: int

    def setup(self):
        K, D, N, R = self.k, self.d_inner, self.d_state, self.dt_rank
        self.x_proj_weight = self.param(
            "x_proj_weight", _stacked_linear_init(D), (K, D, R + 2 * N)
        )
        self.dt_projs_weight = self.param(
            "dt_projs_weight", _stacked_dt_kernel_init(R), (K, R, D)
        )
        self.dt_projs_bias = self.param(
            "dt_projs_bias", dt_proj_bias_init(), (K, D)
        )
        self.A_logs = self.param("A_logs", a_log_init(K, D, N), (K * D, N))
        self.Ds = self.param("Ds", nn.initializers.ones, (K * D,))

    def project_scan(self, u_layouts, chunk):
        """Fused projection + direction-paired scan. The fast path.

        `u_layouts`: tuple of J (B, L, D) sequences — the J distinct
        PHYSICAL layouts of the input (SS2D: J=2 = [row-major, transposed];
        ConMB: J=1 = concat sequence). Direction k = g*J + j pairs group g
        in (fwd, rev) with layout j, matching the reference direction order
        (CrossScan, vmamba.py:80-98: [hw, wh, rev-hw, rev-wh]).

        Three TPU-first rewrites of `cross_selective_scan`
        (vmamba.py:165-226):
          1. dt_proj is COMPOSED into x_proj — dt = (x·Wx[:, :R])·Wdt =
             x·(Wx[:, :R]·Wdt), so one (D -> D+2N) MXU matmul replaces the
             two lane-hostile einsums (R=12, N=16 minor dims).
          2. Reversed directions run as reversed *kernels* over the same
             physical buffers (selective_scan_g(reverse=True)) — the K=4
             flipped sequence copies and the merge un-flips are never
             materialized.
          3. On TPU the J layouts stay SEPARATE operands end to end
             (selective_scan_g_proj_ml): the row-major layout is a free
             reshape of the conv output, the layout-stack copy and the
             per-layout y split never exist, and the direction-group pair
             sum (the un-flip half of CrossMerge, vmamba.py:100-121) runs
             in-kernel via y_accum.

        Returns a tuple of J (B, L, D) outputs summed over direction
        groups; the caller completes the merge by un-transposing layouts
        j>0 and summing.
        """
        j = len(u_layouts)
        b, l, d = u_layouts[0].shape
        n, r, k = self.d_state, self.dt_rank, self.k
        assert k % j == 0
        g = k // j  # direction groups; 2 = (fwd, rev), 1 = fwd only
        xw = self.x_proj_weight  # (K, D, R+2N)
        wdt = jnp.einsum("kdr,kre->kde", xw[..., :r], self.dt_projs_weight)
        cdt = u_layouts[0].dtype
        wdt = wdt.reshape(g, j, d, d).astype(cdt)
        wb = xw[..., r : r + n].reshape(g, j, d, n).astype(cdt)
        wcc = xw[..., r + n :].reshape(g, j, d, n).astype(cdt)

        A = -jnp.exp(self.A_logs.astype(jnp.float32)).reshape(k, d, n)
        A_cl = jnp.swapaxes(A, 1, 2).reshape(g, j, n, d)
        Ds = self.Ds.reshape(g, j, d)
        bias = self.dt_projs_bias.reshape(g, j, d)

        if jax.default_backend() == "tpu":
            # dt/B/C projected ON THE MXU INSIDE the kernel: the streamed
            # (B, g, j, L, D) tensors never touch HBM
            if j == 2:
                ys = None
                for gi in range(g):
                    ys = selective_scan_g_proj_ml(
                        u_layouts, wdt[gi], wb[gi], wcc[gi], A_cl[gi],
                        D=Ds[gi], delta_bias=bias[gi], delta_softplus=True,
                        reverse=(gi == 1), y_accum=ys,
                    )
                return ys
            y = None
            u1 = u_layouts[0][:, None]  # (B, 1, L, D)
            for gi in range(g):
                y = selective_scan_g_proj(
                    u1, wdt[gi], wb[gi], wcc[gi], A_cl[gi],
                    D=Ds[gi], delta_bias=bias[gi], delta_softplus=True,
                    reverse=(gi == 1), y_accum=y,
                )
            return (y[:, 0],)

        # portable path: THREE separate projections (dt, B, C) — slicing a
        # (D+2N)-channel matmul output at 192/16/16 boundaries relayouts
        # the whole tensor on TPU (lane tiles are 128-wide)
        u_st = jnp.stack(u_layouts, axis=1)  # (B, J, L, D)
        dts_a = jnp.einsum("bjld,gjde->bgjle", u_st, wdt)
        bs_a = jnp.einsum("bjld,gjde->bgjle", u_st, wb)
        cs_a = jnp.einsum("bjld,gjde->bgjle", u_st, wcc)
        y = None
        for gi in range(g):
            yg = _scan_dir(
                u_st, dts_a[:, gi], bs_a[:, gi], cs_a[:, gi],
                A_cl[gi], Ds[gi], bias[gi],
                reverse=(gi == 1), chunk=chunk,
            )
            y = yg if y is None else y + yg
        return tuple(y[:, jj] for jj in range(j))


class _SplitDense(nn.Module):
    """One (D -> features) Linear parameter applied as two matmuls on the
    kernel halves [0:split) and [split:features).

    Param tree identical to nn.Dense (`kernel`/`bias`), so the checkpoint
    converters are unaffected. The point: slicing the fused output at a
    non-128-multiple lane boundary (d_inner=192, 384, ...) relayouts the
    whole activation on TPU; slicing the small weight is free.
    """

    features: int
    split: int
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        outs = []
        for lo, hi in ((0, self.split), (self.split, self.features)):
            y = x @ kernel[:, lo:hi]
            if bias is not None:
                y = y + bias[lo:hi].astype(self.dtype)
            outs.append(y)
        return outs


def _scan_dir(u, dts, bs, cs, A_cl, Ds, bias, reverse, chunk):
    """One direction group's scan: Pallas reversed kernel on TPU, explicit
    flips + XLA associative scan elsewhere. All args channel-last:
    u/dts (B, J, L, D), bs/cs (B, J, L, N), A_cl (J, N, D)."""
    if jax.default_backend() == "tpu":
        return selective_scan_g(
            u, dts, A_cl, bs, cs, D=Ds, delta_bias=bias,
            delta_softplus=True, reverse=reverse,
        )
    b, j, l, d = u.shape
    n = bs.shape[-1]
    if reverse:
        u, dts, bs, cs = (t[:, :, ::-1] for t in (u, dts, bs, cs))
    y = selective_scan_cl(
        u.reshape(b * j, l, d), dts.reshape(b * j, l, d), A_cl,
        bs.reshape(b * j, l, n), cs.reshape(b * j, l, n),
        D=Ds, delta_bias=bias, delta_softplus=True, chunk=chunk,
        backend="xla",
    ).reshape(b, j, l, d)
    return y[:, :, ::-1] if reverse else y


def _stacked_linear_init(fan_in: int):
    return torch_linear_kernel_init(fan_in)


def _stacked_dt_kernel_init(dt_rank: int):
    return dt_proj_kernel_init(dt_rank)


class SS2D(nn.Module):
    """2-D selective scan over 4 directions with gated output.

    Input/output: (B, H, W, d_model).
    """

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    bias: bool = False
    dropout: float = 0.0
    ln_eps: float = LN_EPS
    linear_init: str = "trunc_normal"  # backbone ctx; decoders use "torch"
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = _auto(self.dt_rank, self.d_model, 16)
        d_state = _auto(self.d_state, self.d_model, 6)

        xx, z = _SplitDense(
            features=2 * d_inner,
            split=d_inner,
            use_bias=self.bias,
            dtype=self.dtype,
            kernel_init=_linear_init(self.linear_init, self.d_model),
            name="in_proj",
        )(x)
        if self.d_conv > 1:
            xx = depthwise_conv3x3(
                d_inner, bias=self.conv_bias, name="conv2d", dtype=self.dtype
            )(xx)
            xx = nn.silu(xx)

        b, h, w, _ = xx.shape
        l = h * w
        params = _SSMDirParams(
            k=4, d_inner=d_inner, d_state=d_state, dt_rank=dt_rank, name="ssm"
        )
        # two physical layouts (row-major, transposed) as SEPARATE
        # sequences — hw is a free reshape of the conv output, and the
        # kernel consumes both operands directly (no CrossScan stack);
        # reversed directions run inside the kernel
        hw = xx.reshape(b, l, d_inner)
        wh = jnp.swapaxes(xx, 1, 2).reshape(b, l, d_inner)
        y_hw, y_wh = params.project_scan((hw, wh), self.scan_chunk)
        if _FUSED_EPILOGUE and jax.default_backend() == "tpu":
            # one Pallas pass: un-transpose merge + out_norm + silu gate
            # (both layouts read once; the relayout copy, the LN fusion,
            # and the gate fusion never round-trip HBM separately)
            gamma, beta = _LNParams(d_inner, name="out_norm")()
            y = merge_ln_gate(
                y_hw.reshape(b, h, w, d_inner),
                y_wh.reshape(b, w, h, d_inner),
                z, gamma, beta, self.ln_eps, False,
            )
        else:
            # complete CrossMerge: un-transpose the wh layout and sum
            y = y_hw.reshape(b, h, w, d_inner) + jnp.swapaxes(
                y_wh.reshape(b, w, h, d_inner), 1, 2
            )
            y = nn.LayerNorm(epsilon=self.ln_eps, name="out_norm")(y)

            y = y * nn.silu(z)
        out = nn.Dense(
            self.d_model,
            use_bias=self.bias,
            dtype=self.dtype,
            kernel_init=_linear_init(self.linear_init, d_inner),
            name="out_proj",
        )(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ConMBSS2D(nn.Module):
    """Concat-sequence multimodal selective scan (ConMB op).

    Inputs: x_rgb, x_e of shape (B, H, W, d_model); output (B, H, W, d_model).
    """

    d_model: int
    d_state: int = 4
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    bias: bool = False
    dropout: float = 0.0
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = _auto(self.dt_rank, self.d_model, 16)
        d_state = _auto(self.d_state, self.d_model, 6)
        init = torch_linear_kernel_init(self.d_model)

        x_rgb = nn.Dense(
            d_inner, use_bias=self.bias, dtype=self.dtype, kernel_init=init,
            name="in_proj",
        )(x_rgb)
        x_e = nn.Dense(
            d_inner, use_bias=self.bias, dtype=self.dtype, kernel_init=init,
            name="in_proj_modalx",
        )(x_e)

        # SE squeeze uses the pre-conv projections (vmamba.py:1275-1277).
        rgb_sq = jnp.mean(x_rgb, axis=(1, 2))
        e_sq = jnp.mean(x_e, axis=(1, 2))

        xr = nn.silu(
            depthwise_conv3x3(
                d_inner, bias=self.conv_bias, name="conv2d", dtype=self.dtype
            )(x_rgb)
        )
        xe = nn.silu(
            depthwise_conv3x3(
                d_inner,
                bias=self.conv_bias,
                name="conv2d_modalx",
                dtype=self.dtype,
            )(x_e)
        )

        b, h, w, _ = xr.shape
        l = h * w
        params = _SSMDirParams(
            k=2, d_inner=d_inner, d_state=d_state, dt_rank=dt_rank, name="ssm"
        )
        # one physical layout (the concat sequence); the reversed direction
        # runs inside the kernel — CrossScan_multimodal's flipped copy and
        # CrossMerge_multimodal's un-flip never materialize
        seq = jnp.concatenate(
            [xr.reshape(b, l, d_inner), xe.reshape(b, l, d_inner)], axis=1
        )  # (B, 2L, D)
        (ys,) = params.project_scan((seq,), self.scan_chunk)  # (B, 2L, D)
        y_rgb, y_e = ys[:, :l], ys[:, l:]
        y_rgb = nn.LayerNorm(epsilon=self.ln_eps, name="out_norm1")(
            y_rgb.reshape(b, h, w, d_inner)
        )
        y_e = nn.LayerNorm(epsilon=self.ln_eps, name="out_norm2")(
            y_e.reshape(b, h, w, d_inner)
        )

        # cross SE gating (vmamba.py:1274-1281)
        def se(name, v):
            v = nn.Dense(
                max(1, d_inner // 16), use_bias=False, dtype=self.dtype,
                kernel_init=torch_linear_kernel_init(d_inner),
                name=f"{name}_0",
            )(v)
            v = nn.silu(v)
            v = nn.Dense(
                d_inner, use_bias=False, dtype=self.dtype,
                kernel_init=torch_linear_kernel_init(max(1, d_inner // 16)),
                name=f"{name}_1",
            )(v)
            return nn.sigmoid(v)

        rgb_excite = se("fc1", rgb_sq)[:, None, None, :]
        e_excite = se("fc2", e_sq)[:, None, None, :]
        y_rgb = y_rgb * e_excite
        y_e = y_e * rgb_excite

        y = jnp.concatenate([y_rgb, y_e], axis=-1)
        out = nn.Dense(
            self.d_model,
            use_bias=self.bias,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init(2 * d_inner),
            name="out_proj",
        )(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class CrossMambaFusionSS2D(nn.Module):
    """Cross-modal Mamba attention (CroMB op): two 1-D scans over the
    flattened image where the C matrices are swapped between modalities
    (vmamba.py:1528-1539). Both scans run as one `selective_scan` call with
    the modality stacked into channels (G=2 B/C groups).

    Inputs/outputs: pairs of (B, H, W, d_model).
    """

    d_model: int
    d_state: int = 4
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    bias: bool = False
    dropout: float = 0.0
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_rgb, x_e, deterministic: bool = True):
        d_inner = int(self.ssm_ratio * self.d_model)
        dt_rank = _auto(self.dt_rank, self.d_model, 16)
        d_state = _auto(self.d_state, self.d_model, 6)
        n = d_state
        init_m = torch_linear_kernel_init(self.d_model)

        x_rgb = nn.Dense(
            d_inner, use_bias=self.bias, dtype=self.dtype, kernel_init=init_m,
            name="in_proj",
        )(x_rgb)
        x_e = nn.Dense(
            d_inner, use_bias=self.bias, dtype=self.dtype, kernel_init=init_m,
            name="in_proj_modalx",
        )(x_e)

        # NOTE: the reference applies the SAME depthwise conv to both
        # modalities here (vmamba.py:1629-1630) — reproduced deliberately.
        conv = depthwise_conv3x3(
            d_inner, bias=self.conv_bias, name="conv2d", dtype=self.dtype
        )
        xr = nn.silu(conv(x_rgb))
        xe = nn.silu(conv(x_e))

        b, h, w, _ = xr.shape
        l = h * w
        xr_seq = xr.reshape(b, l, d_inner)
        xe_seq = xe.reshape(b, l, d_inner)

        def proj_params(suffix):
            xp = self.param(
                f"x_proj_{suffix}",
                torch_linear_kernel_init(d_inner),
                (d_inner, dt_rank + 2 * n),
            )
            dtw = self.param(
                f"dt_proj_{suffix}_weight",
                dt_proj_kernel_init(dt_rank),
                (dt_rank, d_inner),
            )
            dtb = self.param(
                f"dt_proj_{suffix}_bias", dt_proj_bias_init(), (d_inner,)
            )
            alog = self.param(
                f"A_log_{suffix}", a_log_init(1, d_inner, n), (d_inner, n)
            )
            dskip = self.param(
                f"D_{suffix}", nn.initializers.ones, (d_inner,)
            )
            return xp, dtw, dtb, alog, dskip

        xp1, dtw1, dtb1, alog1, d1 = proj_params("1")
        xp2, dtw2, dtb2, alog2, d2 = proj_params("2")

        # both modality scans in ONE kernel call: groups = modalities
        A_cl = -jnp.exp(
            jnp.stack([alog1.T, alog2.T]).astype(jnp.float32)
        )  # (2, N, D)
        dd = jnp.stack([d1, d2])  # (2, D)
        bias = jnp.stack([dtb1, dtb2])

        if jax.default_backend() == "tpu":
            # dt/B/C projected on the MXU inside the kernel; the swapped-C
            # cross attention (vmamba.py:1528-1539) happens in VMEM —
            # each modality's scan reads the OTHER modality's projected C.
            # The modality sequences stay separate operands (no stack, no
            # y split — selective_scan_g_proj_ml).
            cdt = xr_seq.dtype
            wdt = jnp.stack([xp1[:, :dt_rank] @ dtw1,
                             xp2[:, :dt_rank] @ dtw2]).astype(cdt)
            wb = jnp.stack([xp1[:, dt_rank : dt_rank + n],
                            xp2[:, dt_rank : dt_rank + n]]).astype(cdt)
            wc = jnp.stack([xp1[:, dt_rank + n :],
                            xp2[:, dt_rank + n :]]).astype(cdt)
            y0, y1 = selective_scan_g_proj_ml(
                (xr_seq, xe_seq), wdt, wb, wc, A_cl, D=dd, delta_bias=bias,
                delta_softplus=True, swap_groups_c=True,
            )
        else:
            u = jnp.stack([xr_seq, xe_seq], axis=1)    # (B, 2, L, D)
            def project(seq, xp, dtw):
                # dt_proj composed into x_proj (dt = x @ (Wx[:, :R] @ Wdt))
                dt = seq @ (xp[:, :dt_rank] @ dtw)
                bsm = seq @ xp[:, dt_rank : dt_rank + n]
                csm = seq @ xp[:, dt_rank + n :]
                return dt, bsm, csm

            dt1, b1, c1 = project(xr_seq, xp1, dtw1)
            dt2, b2, c2 = project(xe_seq, xp2, dtw2)
            delta = jnp.stack([dt1, dt2], axis=1)
            bs = jnp.stack([b1, b2], axis=1)           # (B, 2, L, N)
            # swapped C: the cross attention (vmamba.py:1528-1539)
            cs = jnp.stack([c2, c1], axis=1)
            y = selective_scan_cl(
                u.reshape(2 * b, l, d_inner),
                delta.reshape(2 * b, l, d_inner), A_cl,
                bs.reshape(2 * b, l, n), cs.reshape(2 * b, l, n),
                D=dd, delta_bias=bias, delta_softplus=True,
                chunk=self.scan_chunk, backend="xla",
            ).reshape(b, 2, l, d_inner)
            y0, y1 = y[:, 0], y[:, 1]
        y_rgb = nn.LayerNorm(epsilon=self.ln_eps, name="out_norm_1")(y0)
        y_e = nn.LayerNorm(epsilon=self.ln_eps, name="out_norm_2")(y1)

        init_i = torch_linear_kernel_init(d_inner)
        out_rgb = nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=init_i, name="out_proj_rgb",
        )(y_rgb.reshape(b, h, w, d_inner))
        out_e = nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=init_i, name="out_proj_e",
        )(y_e.reshape(b, h, w, d_inner))
        if self.dropout > 0.0:
            drop = nn.Dropout(self.dropout)
            out_rgb = drop(out_rgb, deterministic=deterministic)
            out_e = drop(out_e, deterministic=deterministic)
        return out_rgb, out_e
