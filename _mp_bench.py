import time, numpy as np
from ddalphaamg_tpu import api, config

ini = """
configuration: /root/reference/conf/8x8x8x8b6.0000id3n1
d0 global lattice: 8 8 8 8
d0 block lattice: 2 2 2 2
d0 test vectors: 8
d0 setup iter: 1
number of levels: 2
method: 2
interpolation: 2
mixed precision: 2
iterations between restarts: 25
maximum of restarts: 40
tolerance for relative residual: 1e-8
right hand side: 0
"""
p = config.parse_ini(ini)
s = api.Solver(p)
s.read_conf()
t0=time.time(); s.setup(); print(f"setup {time.time()-t0:.1f}s", flush=True)
x, info = s.solve()          # warm (compiles)
t0=time.time()
x, info = s.solve()
dt = time.time()-t0
b = config.make_rhs("ones", s.lattice)
from ddalphaamg_tpu.utils import device_get_complex
r = b - device_get_complex(s.apply_operator(x))
print(f"mp2-device: solve {dt:.2f}s inner-iters {info.iterations} "
      f"exact relres {np.linalg.norm(r)/np.linalg.norm(b):.2e} conv {info.converged}", flush=True)
