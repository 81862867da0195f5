import time, sys
t0=time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)
import jax
log(f"jax imported, devices={jax.devices()}")
from krylovfspssa_tpu.boxsolver import BoxCmeSolver
from krylovfspssa_tpu.models.library import repressilator_model
from krylovfspssa_tpu.config import SolverConfig
m = repressilator_model()
s = BoxCmeSolver(m, SolverConfig(verbosity=1))
r = s.solve(10.0, [[22,0,0]], fsp_tol=1e-4, krylov_tol=1e-14)
log(f"done wsum={r.wsum} steps={r.stats.nstep} nmult={r.stats.nmult} fsp={r.stats.final_fsp_size} vol={r.box.volume} wall={r.stats.wall_s:.1f}")
