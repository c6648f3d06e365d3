import time, numpy as np, jax, jax.numpy as jnp
from ddalphaamg_tpu import io as dio, cplx
from ddalphaamg_tpu.mg.hierarchy import LevelConfig, MGConfig, Multigrid
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.utils import device_put_complex, host_float

U, _ = dio.read_gauge_field("/root/reference/conf/8x8x8x8b6.0000id3n1", anti_periodic=True)
op = wilson.WilsonOperator.from_gauge(device_put_complex(U, dtype=jnp.complex64), m0=-0.5, csw=1.0)
cfg = MGConfig(levels=[LevelConfig(lattice=(8,8,8,8), block=(2,2,2,2), num_test_vectors=8, setup_iter=0),
                       LevelConfig(lattice=(4,4,4,4), block=(2,2,2,2))],
               split=True, dtype=jnp.complex64, seed=7)
mg = Multigrid(op, cfg)
rng = np.random.default_rng(0)
r = device_put_complex(rng.normal(size=(8,8,8,8,4,3))+1j*rng.normal(size=(8,8,8,8,4,3)), dtype=jnp.complex64)

def timed(name, fn, n=5):
    fn()  # warm/compile
    t0=time.perf_counter()
    for _ in range(n):
        out = fn()
    v = host_float(out) if hasattr(out, 'dtype') or hasattr(out, 're') else out
    dt = (time.perf_counter()-t0)/n
    print(f"{name}: {dt*1e3:.1f} ms (incl sync)", flush=True)

# full cycle
timed("full cycle", lambda: cplx.norm2(mg(r)))

# smoother only
from ddalphaamg_tpu.smoothers.sap import sap_smooth
st = mg.fine.stencil
colors = mg.fine.smoother.colors
v32 = st.from_logical(r).astype(jnp.complex64)
timed("smoother (2cy, oe)", lambda: cplx.norm2(sap_smooth(st, colors, v32, cycles=2, block_iter=4, odd_even=True)))

# coarsest solve only
nxt = mg.fine.next
cshape = (*nxt.geom.lattice, nxt.stencil.field_shape[-1])
bc = device_put_complex(rng.normal(size=cshape)+1j*rng.normal(size=cshape), dtype=jnp.complex64)
cs = jax.jit(lambda s, b: mg._coarsest_solve_traced(s, nxt.geom, b, 5e-2)[0])
timed("coarsest GCR", lambda: cplx.norm2(cs(nxt.stencil, bc)))

# fine full_op (pallas)
fo = jax.jit(st.full_op)
timed("fine full_op (pallas)", lambda: cplx.norm2(fo(v32)))

# restrict+interpolate
from ddalphaamg_tpu.mg.interpolation import restrict, interpolate
ri = jax.jit(lambda P, w: cplx.norm2(restrict(mg.fine.agg, P, st.to_logical(w))))
timed("restrict", lambda: ri(mg.fine.P, v32))
