import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_log_compiles", True)
from ddalphaamg_tpu import io as dio, cplx
from ddalphaamg_tpu.mg.hierarchy import LevelConfig, MGConfig, Multigrid
from ddalphaamg_tpu.operators import wilson
from ddalphaamg_tpu.utils import device_put_complex, host_float

U, _ = dio.read_gauge_field("/root/reference/conf/4x4x4x4b6.0000id3n1", anti_periodic=True)
op = wilson.WilsonOperator.from_gauge(device_put_complex(U, dtype=jnp.complex64), m0=-0.5, csw=1.0)
cfg = MGConfig(levels=[LevelConfig(lattice=(4,4,4,4), block=(2,2,2,2), num_test_vectors=4, setup_iter=0),
                       LevelConfig(lattice=(2,2,2,2), block=(1,1,1,1))],
               split=True, dtype=jnp.complex64, seed=7)
mg = Multigrid(op, cfg)
rng = np.random.default_rng(0)
r = device_put_complex(rng.normal(size=(4,4,4,4,4,3))+1j*rng.normal(size=(4,4,4,4,4,3)), dtype=jnp.complex64)
print("== call 1 ==", flush=True)
t0=time.time(); host_float(cplx.norm2(mg(r))); print(f"call1 {time.time()-t0:.1f}s", flush=True)
print("== call 2 ==", flush=True)
t0=time.time(); host_float(cplx.norm2(mg(r))); print(f"call2 {time.time()-t0:.1f}s", flush=True)
