def test_f32_factorization_with_refinement():
    """pc_factor_dtype=f32 halves factor cost; on a well-conditioned
    system one f64 Richardson pass against the true matrix recovers
    near-f64 accuracy (the refine loop in NewtonSolver._lu_direction)."""
    import numpy as np
    import scipy.sparse as sp
    from proximalgalerkin_tpu.la.direct import PermutedFactorizer

    rng = np.random.default_rng(0)
    n = 400
    A = sp.diags([np.full(n - 1, -1.0), np.full(n, 4.0),
                  np.full(n - 1, -1.0)], [-1, 0, 1]).tocsr()
    perm = rng.permutation(n)
    f = PermutedFactorizer(A, perm, perm, pivot_thresh=0.0,
                           dtype=np.float32)
    lu = f.factor(A)
    b = rng.standard_normal(n)
    x = lu.solve(b)
    assert x.dtype == np.float64
    r0 = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r0 < 1e-6            # f32 factor accuracy
    x = x + lu.solve(b - A @ x)
    r1 = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert r1 < 1e-12           # one refinement pass recovers f64
