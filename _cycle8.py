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
for i in range(4):
    t0=time.time(); v = host_float(cplx.norm2(mg(r * (1.0 + 1e-6*i)))); dt=time.time()-t0
    print(f"cycle call{i}: {dt:.2f}s norm {v:.4e}", flush=True)
# inner_restart timing
t0=time.time(); z, it, cit = mg.inner_restart(r, 1e-7, m=25); v=host_float(it); print(f"inner_restart compile+run: {time.time()-t0:.1f}s iters {v}", flush=True)
for i in range(2):
    t0=time.time(); z, it, cit = mg.inner_restart(r * (1.0+1e-6*i), 1e-7, m=25); v=host_float(it)
    print(f"inner_restart call{i}: {time.time()-t0:.2f}s iters {v}", flush=True)
