"""Component probe: each stage of the fused multiphase-50^2 btlu Newton
run standalone on the device, timed, to find (a) the faulting kernel and
(b) the per-Newton cost decomposition."""
import sys, time
sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np
from proximalgalerkin_tpu.models import multiphase as mpmod
from proximalgalerkin_tpu.solve import nonlinear as nlmod
from proximalgalerkin_tpu.la import blocktri as btm

probs = []
orig = nlmod.NonlinearProblem
class Rec(orig):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        probs.append(self)
mpmod.NonlinearProblem = Rec
# tiny run on CPU-free setup: just build the problem objects (1 step, it
# will solve on device... too slow). Instead build WITHOUT solving:
import proximalgalerkin_tpu  # noqa

N = 50
from proximalgalerkin_tpu.mesh.generation import unit_square_mesh
from proximalgalerkin_tpu.spaces import FunctionSpace, MixedSpace
from proximalgalerkin_tpu.assembly import VolumeForm

def build():
    # replicate solve_multiphase's problem construction
    import types
    fn = mpmod.solve_multiphase
    # monkeypatch NewtonSolver.solve to abort immediately after setup
    from proximalgalerkin_tpu.solve.newton import NewtonSolver
    class Stop(Exception): pass
    orig_solve = NewtonSolver.solve
    def fake(self, x0):
        raise Stop()
    NewtonSolver.solve = fake
    try:
        mpmod.solve_multiphase(N=N, M=N, tau0=1e-5, T=1e-5, verbose=False,
            solver_options={"snes_fused": True, "ksp_type": "preonly",
                            "pc_type": "btlu", "ksp_rtol": 1e-9,
                            "pc_factor_dtype": "f64", "pc_factor_lag": 1})
    except Stop:
        pass
    finally:
        NewtonSolver.solve = orig_solve
    return probs[-1]

prob = build()
print("dofs", prob.space.num_dofs, flush=True)
blocking = prob.line_blocking()
print("nb", blocking.nb, "bs", blocking.bs, flush=True)
ell = prob.ell_matrix
maps = blocking.device_maps()
split = prob.ell_split

rng = np.random.default_rng(0)
x = jnp.asarray(np.log(np.abs(rng.dirichlet(np.ones(4), prob.space.num_dofs // 12).reshape(-1)) + 1e-7) + 1.0)
x = jnp.concatenate([jnp.zeros(2 * prob.space.num_dofs // 3), x])
cc, kk = dict(prob.coeffs), dict(prob.consts)

def timed(name, f, *a, reps=3):
    try:
        o = f(*a); jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(reps):
            o = f(*a)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return o
    except Exception as e:
        print(f"{name}: FAULT {type(e).__name__}: {e}", flush=True)
        raise SystemExit(1)

# 1. split nl assembly (device)
nl = jax.jit(lambda x: split.nl_core(x, cc, kk, split.extra))
timed("nl_core (softmax ELL delta)", nl, x)
lin = split.lin_data(cc, kk)
data = jax.jit(lambda x, lin: lin + split.nl_core(x, cc, kk, split.extra))
d = timed("data = lin + nl", data, x, lin)

# 2. bt_assemble f64
asm = jax.jit(lambda d: btm.bt_assemble(d, ell.arrays["ell_cols"], maps,
                                        blocking.nb, blocking.bs, "f64"),
              static_argnames=())
D, L, U, s = timed("bt_assemble f64", asm, d)

# 3. Thomas factor f64
fac = jax.jit(btm.bt_factor)
Minv, T = timed("bt_factor thomas f64", fac, D, L, U)

# 4. f32 apply
b = jnp.asarray(rng.standard_normal(prob.space.num_dofs))
Minv32, T32, L32 = Minv.astype(jnp.float32), T.astype(jnp.float32), L.astype(jnp.float32)
sol = jax.jit(lambda M, T_, L_, s_, b: btm.bt_solve(M, T_, L_, s_, b, maps,
                                     blocking.nb, blocking.bs))
timed("bt_solve f32 apply", sol, Minv32, T32, L32, s, b)

# 5. f64 SpMV (refinement residual)
spmv = jax.jit(lambda d_, v: ell.spmv(d_, v, ell.arrays))
timed("ell spmv f64", spmv, d, b)

# 6. residual
res = jax.jit(lambda x: prob.form._residual_core(x, cc, kk, prob.form.cell_data))
timed("residual f64", res, x)

# 7. CR factor f64
fcr = jax.jit(btm.bt_factor_cr)
levels, root = timed("bt_factor_cr f64", fcr, D, L, U)

# 8. CR f32 apply
lev32, root32 = btm._cr_cast(levels, root, jnp.float32)
solcr = jax.jit(lambda lv, rt, s_, b: btm.bt_solve_cr(lv, rt, s_, b,
                                          maps["rhs_idx"], blocking.nb,
                                          blocking.bs))
timed("bt_solve_cr f32 apply", solcr, lev32, root32, s, b)
print("ALL OK", flush=True)
