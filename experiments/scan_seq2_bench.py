"""Sequential scan v2: vectorized a/b precompute per sub-block + tight
sequential h-update loop."""
import sys, time, functools, os
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, h_scr, ab_scr, bb_scr, *, T, SUB, UNROLL):
    il = pl.program_id(2)
    @pl.when(il == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
    A = a_ref[...]          # (N, db)
    n_sub = T // SUB
    def outer(si, h):
        s0 = si * SUB
        d_blk = d_ref[0, pl.ds(s0, SUB), :]          # (SUB, db)
        u_blk = u_ref[0, pl.ds(s0, SUB), :]
        b_blk = b_ref[0, pl.ds(s0, SUB), :]          # (SUB, N)
        # vectorized precompute: a (SUB, N, db), b (SUB, N, db)
        ab_scr[...] = jnp.exp(d_blk[:, None, :] * A[None])
        bb_scr[...] = (d_blk * u_blk)[:, None, :] * b_blk[:, :, None]
        def inner(i, h):
            t0 = i * UNROLL
            ys = []
            for k in range(UNROLL):
                a_t = ab_scr[t0 + k]
                b_t = bb_scr[t0 + k]
                h = a_t * h + b_t
                ct = c_ref[0, s0 + t0 + k, :][:, None]
                ys.append(jnp.sum(ct * h, axis=0))
            y_ref[0, pl.ds(s0 + t0, UNROLL), :] = jnp.stack(ys, 0)
            return h
        return jax.lax.fori_loop(0, SUB // UNROLL, inner, h)
    h = jax.lax.fori_loop(0, n_sub, outer, h_scr[...])
    h_scr[...] = h

def run(db=192, T=512, SUB=64, UNROLL=16, iters=5):
    B, D, L, N, G = 4, 768, 19200, 16, 4
    dg = D // G
    rng = np.random.default_rng(0)
    Lp = -(-L // T) * T
    u = np.zeros((B*G, Lp, dg), np.float32); u[:, :L] = rng.standard_normal((B*G, L, dg))
    d = np.zeros((B*G, Lp, dg), np.float32); d[:, :L] = 0.3*rng.random((B*G, L, dg))
    Bm = np.zeros((B*G, Lp, N), np.float32); Bm[:, :L] = rng.standard_normal((B*G, L, N))
    Cm = np.zeros((B*G, Lp, N), np.float32); Cm[:, :L] = rng.standard_normal((B*G, L, N))
    A = (-np.exp(rng.random((G, N, dg)))).astype(np.float32).reshape(G*N, dg)
    nd = dg // db
    nl = Lp // T
    f = pl.pallas_call(
        functools.partial(kern, T=T, SUB=SUB, UNROLL=UNROLL),
        grid=(B*G, nd, nl),
        in_specs=[
            pl.BlockSpec((1, T, db), lambda b_,i,j:(b_,j,i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, db), lambda b_,i,j:(b_,j,i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, db), lambda b_,i,j, G=G, nd=nd: ((b_%G), i) if nd>1 else ((b_%G), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_,i,j:(b_,j,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b_,i,j:(b_,j,0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, db), lambda b_,i,j:(b_,j,i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B*G, Lp, dg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, db), jnp.float32),
                        pltpu.VMEM((SUB, 16, db), jnp.float32),
                        pltpu.VMEM((SUB, 16, db), jnp.float32)],
    )
    uj, dj = jnp.asarray(u), jnp.asarray(d)
    Bj, Cj = jnp.asarray(Bm), jnp.asarray(Cm)
    Aj = jnp.asarray(A)
    g = jax.jit(f)
    y = g(uj, dj, Aj, Bj, Cj); _=float(y[0,0,0])
    t0=time.perf_counter()
    for _ in range(iters): y = g(uj, dj, Aj, Bj, Cj)
    _=float(y[0,0,0])
    dt_ms = (time.perf_counter()-t0)/iters*1000
    from sigma_tpu.ops.selective_scan import selective_scan_ref
    y_ref = selective_scan_ref(
        jnp.asarray(np.swapaxes(u[:1, :L, :8], 1, 2)), jnp.asarray(np.swapaxes(d[:1, :L, :8], 1, 2)),
        jnp.asarray(A.reshape(G,N,dg)[0,:, :8].T),
        jnp.asarray(np.swapaxes(Bm[:1, :L], 1, 2)[:, None]), jnp.asarray(np.swapaxes(Cm[:1, :L], 1, 2)[:, None]), None, None, False)
    got = np.swapaxes(np.asarray(y)[:1, :L, :8], 1, 2)
    err = float(np.abs(got - np.asarray(y_ref)).max())
    print(f"seq2 db={db} T={T} SUB={SUB} U={UNROLL}: {dt_ms:.1f} ms (err {err:.2e})", flush=True)

if __name__ == "__main__":
    run(192, int(os.environ.get("T","512")), int(os.environ.get("SUB","64")), int(os.environ.get("UNROLL","16")))
