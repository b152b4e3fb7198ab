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
