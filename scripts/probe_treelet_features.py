"""Probe the Mosaic features the treelet traversal kernel needs, on real TPU.

Each probe runs in its own subprocess: a faulting kernel crashes the TPU
worker and poisons every later call in the same process.

  while      jax.lax.while_loop inside a kernel (incl. nested)
  dma_smem   SMEM-scalar -> dynamic HBM .at[idx] DMA   (control; the
             gather kernel already relies on this)
  red_when   full-array reduce -> traced scalar -> pl.when
  red_dma    full-array reduce -> traced scalar -> dynamic DMA index
  red_smem_dma  reduce -> scalar -> SMEM scratch round-trip -> DMA index
  onehot     bf16 one-hot matmul gather, exact f32 3-chunk reconstruction
  when_mm    pl.when around a matmul + DMA
"""

import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def _imports():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, pl, pltpu


@probe
def p_while():
    jax, jnp, pl, pltpu = _imports()

    def kern(x_ref, o_ref):
        def body(c):
            i, acc = c

            def body2(c2):
                return (c2[0] - 1, c2[1] + 1.0)

            _, add = jax.lax.while_loop(lambda c2: c2[0] > 0, body2,
                                        (i, 0.0))
            return (i + 1, acc + add)

        _, acc = jax.lax.while_loop(lambda c: c[0] < x_ref[0, 0], body,
                                    (jnp.int32(0), jnp.float32(0)))
        o_ref[:] = jnp.full_like(o_ref, acc)

    x = jnp.array([[5]], jnp.int32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    assert float(out[0, 0]) == 10.0, float(out[0, 0])


@probe
def p_while_vec_carry():
    """while_loop carrying (1, R) vectors — the kernel's actual state."""
    jax, jnp, pl, pltpu = _imports()
    R = 256

    def kern(x_ref, o_ref):
        def cond(c):
            return jnp.any(c[0] < 10)

        def body(c):
            cur, acc = c
            return cur + 1, acc + cur.astype(jnp.float32)

        cur0 = x_ref[:].astype(jnp.int32)
        _, acc = jax.lax.while_loop(cond, body,
                                    (cur0, jnp.zeros((1, R), jnp.float32)))
        o_ref[:] = acc

    x = jnp.zeros((1, R), jnp.float32).at[0, 3].set(5.0)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )(x)
    # loop runs until ALL lanes reach 10 (no per-lane mask here): lane 0
    # accumulates 0+..+9, lane 3 (start 5) accumulates 5+..+14
    assert float(out[0, 0]) == 45.0, out[0, :6]
    assert float(out[0, 3]) == 95.0, out[0, :6]


@probe
def p_dma_smem():
    jax, jnp, pl, pltpu = _imports()

    def kern(idx_ref, tab_ref, o_ref, buf, sem):
        idx = idx_ref[0]
        cp = pltpu.make_async_copy(tab_ref.at[idx], buf, sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:]

    tab = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(jnp.array([2], jnp.int32), tab)
    assert np.allclose(np.asarray(out), np.asarray(tab[2]))


@probe
def p_red_when():
    jax, jnp, pl, pltpu = _imports()

    def kern(x_ref, o_ref):
        m = jnp.min(x_ref[:])
        o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(m > 3)
        def _():
            o_ref[:] = jnp.ones_like(o_ref)

    x = jnp.full((8, 128), 7, jnp.int32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    assert float(out[0, 0]) == 1.0


@probe
def p_red_dma():
    jax, jnp, pl, pltpu = _imports()

    def kern(idxv_ref, tab_ref, o_ref, buf, sem):
        idx = jnp.min(idxv_ref[:]).astype(jnp.int32)
        cp = pltpu.make_async_copy(tab_ref.at[idx], buf, sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:]

    tab = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    idxv = jnp.full((8, 128), 7, jnp.int32).at[3, 17].set(2)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idxv, tab)
    assert np.allclose(np.asarray(out), np.asarray(tab[2])), out[0, :4]


@probe
def p_red_smem_dma():
    jax, jnp, pl, pltpu = _imports()

    def kern(idxv_ref, tab_ref, o_ref, buf, ss, sem):
        ss[0] = jnp.min(idxv_ref[:]).astype(jnp.int32)
        idx = ss[0]
        cp = pltpu.make_async_copy(tab_ref.at[idx], buf, sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:]

    tab = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    idxv = jnp.full((8, 128), 7, jnp.int32).at[3, 17].set(2)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idxv, tab)
    assert np.allclose(np.asarray(out), np.asarray(tab[2])), out[0, :4]


@probe
def p_onehot():
    jax, jnp, pl, pltpu = _imports()
    T, R = 512, 256
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(T,)).astype(np.float32) * 37.3)
    hi = vals.astype(jnp.bfloat16)
    r1 = vals - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    recon = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
             + lo.astype(jnp.float32))
    assert bool(jnp.all(recon == vals)), "host 3-chunk split not exact"
    tabT = jnp.zeros((128, T), jnp.bfloat16)
    tabT = tabT.at[0].set(hi).at[1].set(mid).at[2].set(lo)
    cursors = jnp.asarray(rng.integers(0, T, size=(1, R)), jnp.int32)

    def kern(cur_ref, tab_ref, o_ref):
        cur = cur_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0)
        onehot = (iota == cur).astype(jnp.bfloat16)
        q = jnp.dot(tab_ref[:], onehot, preferred_element_type=jnp.float32)
        o_ref[:] = q[0:1, :] + q[1:2, :] + q[2:3, :]

    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )(cursors, tabT)
    want = np.asarray(vals)[np.asarray(cursors)[0]]
    got = np.asarray(out)[0]
    assert np.array_equal(got, want), (got[:4], want[:4])


@probe
def p_when_mm():
    jax, jnp, pl, pltpu = _imports()

    def kern(flag_ref, tab_ref, o_ref, buf, sem):
        o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(flag_ref[0] > 0)
        def _():
            cp = pltpu.make_async_copy(tab_ref.at[1], buf, sem)
            cp.start()
            cp.wait()
            a = buf[:].astype(jnp.bfloat16)
            q = jnp.dot(a, a.T, preferred_element_type=jnp.float32)
            o_ref[:] = q[:, 0:128]

    tab = jnp.ones((2, 128, 256), jnp.float32)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((128, 256), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(jnp.array([1], jnp.int32), tab)
    assert float(out[0, 0]) == 256.0, float(out[0, 0])


def main():
    if len(sys.argv) > 1:
        PROBES[sys.argv[1]]()
        print("OK", flush=True)
        return
    for name in PROBES:
        r = subprocess.run(
            [sys.executable, __file__, name], capture_output=True,
            text=True, timeout=900)
        if r.returncode == 0 and "OK" in r.stdout:
            print(f"PASS {name}", flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().split("\n")
            tail = [ln for ln in tail if "WARNING" not in ln][-3:]
            print(f"FAIL {name}: " + " | ".join(tail), flush=True)

@probe
def p_reshape_8x128():
    """(8,128) -> (1,1024) sublane-to-lane reshape inside a kernel (the
    K-packed one-hot flush needs records laid out along lanes)."""
    jax, jnp, pl, pltpu = _imports()

    def kern(x_ref, o_ref):
        v = x_ref[:]  # (8, 128)
        f = v.reshape(1, 1024)
        o_ref[:] = jnp.broadcast_to(f, (8, 1024))

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32),
    )(x)
    want = np.arange(8 * 128, dtype=np.float32)[None, :]
    assert np.array_equal(np.asarray(out)[0:1], want), out[0, :6]


@probe
def p_packed_pair_flush():
    """K-packed 2-D one-hot histogram: 8 record rows as one K=1024 dot."""
    jax, jnp, pl, pltpu = _imports()
    NI, NJ, ROWS, LANES = 64, 128, 8, 128
    rng = np.random.default_rng(0)
    ib = jnp.asarray(rng.integers(0, NI, (ROWS, LANES)), jnp.int32)
    jb = jnp.asarray(rng.integers(0, NJ, (ROWS, LANES)), jnp.int32)
    v = jnp.asarray(rng.normal(size=(ROWS, LANES)).astype(np.float32))

    def kern(ib_ref, jb_ref, v_ref, o_ref):
        L8 = ROWS * LANES
        ibf = ib_ref[:].reshape(1, L8)
        jbf = jb_ref[:].reshape(1, L8)
        vf = v_ref[:].reshape(1, L8)
        vhi = vf.astype(jnp.bfloat16).astype(jnp.float32)
        vlo = vf - vhi
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (NI, L8), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (NJ, L8), 0)
        a = (iota_i == ibf).astype(jnp.bfloat16)
        m = iota_j == jbf
        vh = jnp.where(m, vhi, 0.0).astype(jnp.bfloat16)
        vl = jnp.where(m, vlo, 0.0).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        p = jax.lax.dot_general(a, vh, dn,
                                preferred_element_type=jnp.float32)
        p = p + jax.lax.dot_general(a, vl, dn,
                                    preferred_element_type=jnp.float32)
        o_ref[:] = p

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NI, NJ), jnp.float32),
    )(ib, jb, v)
    want = np.zeros((NI, NJ), np.float64)
    ibn, jbn, vn = map(np.asarray, (ib, jb, v))
    vhi = vn.astype(jnp.bfloat16).astype(np.float32)
    vlo = vn - vhi
    for r in range(ROWS):
        for l in range(LANES):
            want[ibn[r, l], jbn[r, l]] += (float(vhi[r, l])
                                           + float(vlo[r, l]))
    got = np.asarray(out, np.float64)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
    assert err < 1e-6, err


if __name__ == "__main__":
    main()
