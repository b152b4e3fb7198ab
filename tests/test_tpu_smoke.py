"""On-TPU (non-interpret) kernel parity smoke test.

tests/conftest.py forces JAX_PLATFORMS=cpu for the rest of the suite, so
Pallas kernels are otherwise only exercised in interpret mode — which cannot
catch Mosaic-specific failures (layout casts, scoped-VMEM OOM, alignment).
This test re-execs in a subprocess with the TPU visible and checks the
fused-G kernel's forward AND gradients against the XLA associative-scan
reference at a Sigma stage shape. Skipped when no TPU is reachable.

Tolerance envelope follows the reference CUDA kernel's own test
(/root/reference/models/encoders/selective_scan/test_selective_scan.py:148).
"""

import os
import subprocess
import sys

import pytest

_BODY = r"""
import os, sys
import jax, jax.numpy as jnp
if jax.default_backend() != "tpu":
    print("NO_TPU")
    sys.exit(0)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sigma_tpu.ops.pallas_scan_g import selective_scan_g
from sigma_tpu.ops.selective_scan import selective_scan_cl
B, G, L, dg, N = 2, 4, 1200, 192, 16
ks = jax.random.split(jax.random.PRNGKey(0), 7)
u = jax.random.normal(ks[0], (B, G, L, dg))
d = jax.random.normal(ks[1], (B, G, L, dg)) * 0.1
A = -jnp.exp(jax.random.normal(ks[2], (G, N, dg)))
Bm = jax.random.normal(ks[3], (B, G, L, N))
Cm = jax.random.normal(ks[4], (B, G, L, N))
D = jax.random.normal(ks[5], (G, dg))
bias = jax.random.normal(ks[6], (G, dg)) * 0.1
kw = dict(D=D, delta_bias=bias, delta_softplus=True)
y = selective_scan_g(u, d, A, Bm, Cm, **kw)
y_ref = selective_scan_cl(
    u.reshape(B * G, L, dg), d.reshape(B * G, L, dg), A,
    Bm.reshape(B * G, L, N), Cm.reshape(B * G, L, N),
    backend="xla", **kw).reshape(B, G, L, dg)
err = float(jnp.abs(y - y_ref).max())
sc = float(jnp.abs(y_ref).max())
assert err <= 2e-3 + 6e-4 * sc, ("fwd", err, sc)
def f(u):
    return (selective_scan_g(u, d, A, Bm, Cm, **kw) ** 2).sum()
def fr(u):
    return (selective_scan_cl(
        u.reshape(B * G, L, dg), d.reshape(B * G, L, dg), A,
        Bm.reshape(B * G, L, N), Cm.reshape(B * G, L, N),
        backend="xla", **kw) ** 2).sum()
g1 = jax.grad(f)(u)
g2 = jax.grad(fr)(u).reshape(B, G, L, dg)
gerr = float(jnp.abs(g1 - g2).max())
gsc = float(jnp.abs(g2).max())
assert gerr <= 1e-2 + 2e-3 * gsc, ("grad", gerr, gsc)
print(f"TPU_OK fwd={err:.2e} grad={gerr:.2e}")
"""


@pytest.mark.tpu
def test_fused_scan_on_tpu():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _BODY],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
    )
    out = proc.stdout + proc.stderr
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU visible in subprocess")
    assert proc.returncode == 0, out[-3000:]
    assert "TPU_OK" in proc.stdout, out[-3000:]


_BODY_PROJ = r"""
import os, sys
import jax, jax.numpy as jnp
if jax.default_backend() != "tpu":
    print("NO_TPU")
    sys.exit(0)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj
from sigma_tpu.ops.selective_scan import selective_scan_cl

def ref(u, wdt, wb, wc, A, D, bias):
    B, G, L, dg = u.shape
    N = A.shape[1]
    dts = jnp.einsum("bgld,gde->bgle", u, wdt)
    bs = jnp.einsum("bgld,gdn->bgln", u, wb)
    cs = jnp.einsum("bgld,gdn->bgln", u, wc)
    return selective_scan_cl(
        u.reshape(B * G, L, dg), dts.reshape(B * G, L, dg), A,
        bs.reshape(B * G, L, N), cs.reshape(B * G, L, N),
        D=D, delta_bias=bias, delta_softplus=True, backend="xla",
    ).reshape(B, G, L, dg)

def check(B, G, L, dg, N, reverse, grads, tag):
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    u = jax.random.normal(ks[0], (B, G, L, dg))
    wdt = jax.random.normal(ks[1], (G, dg, dg)) * (1.0 / dg ** 0.5) * 0.3
    wb = jax.random.normal(ks[2], (G, dg, N)) * (1.0 / dg ** 0.5)
    wc = jax.random.normal(ks[3], (G, dg, N)) * (1.0 / dg ** 0.5)
    A = -jnp.exp(jax.random.normal(ks[4], (G, N, dg)))
    D = jax.random.normal(ks[5], (G, dg))
    bias = jax.random.normal(ks[6], (G, dg)) * 0.1
    args = (u, wdt, wb, wc, A, D, bias)

    def loss_g(args):
        u, wdt, wb, wc, A, D, bias = args
        y = selective_scan_g_proj(
            u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
            reverse=reverse)
        return (y ** 2).sum()

    def loss_r(args):
        u, wdt, wb, wc, A, D, bias = args
        if reverse:
            y = ref(u[:, :, ::-1], wdt, wb, wc, A, D, bias)[:, :, ::-1]
        else:
            y = ref(u, wdt, wb, wc, A, D, bias)
        return (y ** 2).sum()

    if grads:
        gg = jax.jit(jax.grad(loss_g))(args)
        gr = jax.jit(jax.grad(loss_r))(args)
        names = ["du", "dwdt", "dwb", "dwc", "dA", "dD", "dbias"]
        for name, a, b in zip(names, gg, gr):
            sc = max(float(jnp.abs(b).max()), 1.0)
            err = float(jnp.abs(a - b).max()) / sc
            assert err <= 2e-3, (tag, name, err)
        print(f"{tag} grads OK")
    else:
        lg = float(jax.jit(loss_g)(args))
        lr = float(jax.jit(loss_r)(args))
        assert abs(lg - lr) / max(abs(lr), 1.0) <= 2e-3, (tag, lg, lr)
        print(f"{tag} fwd OK")

# production SS2D stage-1 class: fused proj, fwd + ALL 7 cotangents,
# both scan directions (ss2d.py project_scan reverse=(gi==1))
check(2, 2, 1200, 192, 16, False, True, "proj_fwd_dir")
check(2, 2, 1200, 192, 16, True, True, "proj_rev_dir")
# wide-dg route: proj falls back to decomposed einsum + dg-TILED streamed
# kernel (sigma_base stage 4 class: G=2, dg=2048, fixed d_state=16)
check(1, 2, 300, 2048, 16, False, True, "wide_decomposed")
print("TPU_PROJ_OK")
"""


@pytest.mark.tpu
def test_proj_and_wide_paths_on_tpu():
    """Non-interpret smoke for the PRODUCTION kernel paths: fused-proj
    fwd+bwd (all 7 cotangents) in both directions, and the wide-dg
    decomposed/tiled route sigma_base stage 4 takes."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _BODY_PROJ],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1800,
    )
    out = proc.stdout + proc.stderr
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU visible in subprocess")
    assert proc.returncode == 0, out[-3000:]
    assert "TPU_PROJ_OK" in proc.stdout, out[-3000:]
