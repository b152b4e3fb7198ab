"""Experiment: segmented two-level Pallas scan (sublane within-segment +
lane-wise cross-segment) vs the v1 lane-doubling kernel."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 16  # segment length (sublanes)

def kern_v2(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, carry, *, nsc):
    il = pl.program_id(2)
    @pl.when(il == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
    delta = d_ref[0]       # (db, M, nsc)
    u = u_ref[0]
    A = a_ref[...]         # (db, N)
    bmat = b_ref[0]        # (N, M, nsc)
    cmat = c_ref[0]
    a = jnp.exp(delta[:, None] * A[:, :, None, None])   # (db, N, M, nsc)
    b = (delta * u)[:, None] * bmat[None]
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M, nsc), 2)
    k = 1
    while k < M:
        a_sh = pltpu.roll(a, k, 2)
        b_sh = pltpu.roll(b, k, 2)
        mask = sub >= k
        b = jnp.where(mask, a * b_sh + b, b)
        a = jnp.where(mask, a * a_sh, a)
        k *= 2
    a_seg = a[:, :, M - 1, :]   # (db, N, nsc)
    b_seg = b[:, :, M - 1, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nsc), 2)
    p, s = a_seg, b_seg
    k = 1
    while k < nsc:
        p_sh = pltpu.roll(p, k, 2)
        s_sh = pltpu.roll(s, k, 2)
        mask = lane >= k
        s = jnp.where(mask, p * s_sh + s, s)
        p = jnp.where(mask, p * p_sh, p)
        k *= 2
    c0 = carry[...]
    h_end = s + p * c0[:, :, None]
    h_excl = pltpu.roll(h_end, 1, 2)
    h_excl = jnp.where(lane >= 1, h_excl, c0[:, :, None])
    h = b + a * h_excl[:, :, None, :]
    y_ref[0] = jnp.sum(h * cmat[None], axis=1)
    carry[...] = h_end[:, :, nsc - 1]

def run_v2(db=16, nsc=128, iters=5):
    B, D, L, N, G = 4, 768, 19200, 16, 4
    dg = D // G
    rng = np.random.default_rng(0)
    Lp = -(-L // (M * nsc)) * (M * nsc)
    u = np.zeros((B*G, dg, Lp), np.float32); u[:, :, :L] = rng.standard_normal((B*G, dg, L))
    d = np.zeros((B*G, dg, Lp), np.float32); d[:, :, :L] = 0.3*rng.random((B*G, dg, L))
    Bm = np.zeros((B*G, N, Lp), np.float32); Bm[:, :, :L] = rng.standard_normal((B*G, N, L))
    Cm = np.zeros((B*G, N, Lp), np.float32); Cm[:, :, :L] = rng.standard_normal((B*G, N, L))
    A = (-np.exp(rng.random((G*dg, N)))).astype(np.float32)
    # segment-major: (BG, dg, m, ns_tot)
    ns_tot = Lp // M
    def segmajor(x):
        s = x.reshape(x.shape[0], x.shape[1], ns_tot, M)
        return jnp.asarray(np.ascontiguousarray(np.swapaxes(s, -1, -2)))
    u_s, d_s = segmajor(u), segmajor(d)
    B_s, C_s = segmajor(Bm), segmajor(Cm)
    A_j = jnp.asarray(A)
    nd = dg // db
    nl = ns_tot // nsc
    f = pl.pallas_call(
        functools.partial(kern_v2, nsc=nsc),
        grid=(B*G, nd, nl),
        in_specs=[
            pl.BlockSpec((1, db, M, nsc), lambda b_,i,j:(b_,i,0,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db, M, nsc), lambda b_,i,j:(b_,i,0,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((db, 16), lambda b_,i,j, G=G, nd=nd: ((b_%G)*nd+i,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, M, nsc), lambda b_,i,j:(b_,0,0,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, M, nsc), lambda b_,i,j:(b_,0,0,j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, db, M, nsc), lambda b_,i,j:(b_,i,0,j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B*G, dg, M, ns_tot), jnp.float32),
        scratch_shapes=[pltpu.VMEM((db, 16), jnp.float32)],
    )
    g = jax.jit(f)
    y = g(u_s, d_s, A_j, B_s, C_s); _=float(y[0,0,0,0])
    t0=time.perf_counter()
    for _ in range(iters): y = g(u_s, d_s, A_j, B_s, C_s)
    _=float(y[0,0,0,0])
    dt = (time.perf_counter()-t0)/iters*1000
    # correctness vs reference on a slice
    from sigma_tpu.ops.selective_scan import selective_scan_ref
    y_np = np.swapaxes(np.asarray(y), -1, -2).reshape(B*G, dg, Lp)[:, :, :L]
    y_ref = selective_scan_ref(
        jnp.asarray(u[:1, :8, :L]), jnp.asarray(d[:1, :8, :L]), jnp.asarray(A[:8]),
        jnp.asarray(Bm[:1, None, :, :L]), jnp.asarray(Cm[:1, None, :, :L]), None, None, False)
    err = float(np.abs(y_np[:1, :8] - np.asarray(y_ref)).max())
    print(f"v2 db={db} nsc={nsc}: {dt:.1f} ms (err {err:.2e})", flush=True)

if __name__ == "__main__":
    run_v2(16, 128)
    run_v2(32, 128)
    run_v2(32, 256)
