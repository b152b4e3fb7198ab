"""Experiment: sequential-over-L Pallas scan — channels in lanes, state
(N, db) updated per position; B/C broadcast from (N,1) slices."""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern_seq(u_ref, d_ref, a_ref, b_ref, c_ref, y_ref, h_scr, *, T):
    il = pl.program_id(2)
    @pl.when(il == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
    A = a_ref[...]          # (N, db)
    import os
    UNROLL = int(os.environ.get("UNROLL", "8"))
    def body(i, h):
        t0 = i * UNROLL
        du8 = d_ref[0, pl.ds(t0, UNROLL), :]   # (U, db)
        uu8 = u_ref[0, pl.ds(t0, UNROLL), :]
        bb8 = b_ref[0, pl.ds(t0, UNROLL), :]   # (U, N)
        cc8 = c_ref[0, pl.ds(t0, UNROLL), :]
        ys = []
        for k in range(UNROLL):
            dt = du8[k][None, :]
            ut = uu8[k][None, :]
            Bt = bb8[k][:, None]
            Ct = cc8[k][:, None]
            a = jnp.exp(dt * A)
            h = a * h + (dt * ut) * Bt
            ys.append(jnp.sum(Ct * h, axis=0))
        y_ref[0, pl.ds(t0, UNROLL), :] = jnp.stack(ys, axis=0)
        return h
    h = jax.lax.fori_loop(0, T // UNROLL, body, h_scr[...])
    h_scr[...] = h

def run_seq(db=192, T=512, iters=5):
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
        functools.partial(kern_seq, T=T),
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
        scratch_shapes=[pltpu.VMEM((16, db), jnp.float32)],
    )
    # A blockspec: reshape A to (G*N, dg) rows; block (N, db) at row g*N
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
        jnp.asarray(-np.exp(np.random.default_rng(0).random((G, N, dg))).astype(np.float32)[0, :, :8].T*0 + A.reshape(G,N,dg)[0,:, :8].T),
        jnp.asarray(np.swapaxes(Bm[:1, :L], 1, 2)[:, None]), jnp.asarray(np.swapaxes(Cm[:1, :L], 1, 2)[:, None]), None, None, False)
    got = np.swapaxes(np.asarray(y)[:1, :L, :8], 1, 2)
    err = float(np.abs(got - np.asarray(y_ref)).max())
    print(f"seq db={db} T={T}: {dt_ms:.1f} ms (err {err:.2e})", flush=True)

if __name__ == "__main__":
    run_seq(192, 512)
