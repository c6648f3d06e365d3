import time, numpy as np
from ddalphaamg_tpu import api, config
ini = """
configuration: /root/reference/conf/4x4x4x4b6.0000id3n1
d0 global lattice: 4 4 4 4
d0 block lattice: 2 2 2 2
d0 test vectors: 6
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
print("pre-setup", flush=True)
t0=time.time(); s.setup(); print(f"setup {time.time()-t0:.1f}s", flush=True)
print("pre-warm-solve", flush=True)
x, info = s.solve()
t0=time.time(); x, info = s.solve(); dt=time.time()-t0
b = config.make_rhs("ones", s.lattice)
from ddalphaamg_tpu.utils import device_get_complex
r = b - device_get_complex(s.apply_operator(x))
print(f"mp2-device 4^4: solve {dt:.2f}s inner-iters {info.iterations} exact relres {np.linalg.norm(r)/np.linalg.norm(b):.2e} conv {info.converged}", flush=True)
