"""Dense-oracle helpers: build J / J^T F / diag(J^T J) with jax.jacfwd on
tiny problems and run an exact-solve Gauss-Newton as ground truth.  This
plays the role Ceres plays for the reference (the de-facto correctness
standard, /root/reference/examples/shared/CombinedSolverBase.h:102-155)."""
import jax
import jax.numpy as jnp
import numpy as np


def flatten_tree(U):
    leaves, treedef = jax.tree_util.tree_flatten(U)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    flat = jnp.concatenate([l.reshape(-1) for l in leaves])

    def unflatten(v):
        out = []
        o = 0
        for s, n in zip(shapes, sizes):
            out.append(v[o:o + n].reshape(s))
            o += n
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unflatten


def dense_jacobian(res_fn, U):
    """res_fn: U-pytree -> concatenated residual vector.  Returns (r, J)."""
    flat, unflatten = flatten_tree(U)
    f = lambda v: res_fn(unflatten(v))  # noqa: E731
    r = f(flat)
    J = jax.jacfwd(f)(flat)
    return r, J, flat, unflatten


def dense_gn_solve(res_fn, U, iters=10, damping=0.0):
    """Exact-solve Gauss-Newton ground truth."""
    flat, unflatten = flatten_tree(U)
    f = lambda v: res_fn(unflatten(v))  # noqa: E731
    for _ in range(iters):
        r = f(flat)
        J = jax.jacfwd(f)(flat)
        A = J.T @ J + damping * jnp.eye(J.shape[1])
        g = J.T @ r
        delta = jnp.linalg.solve(A, -g)
        flat = flat + delta
    r = f(flat)
    return 0.5 * float(r @ r), unflatten(flat)


def total_cost(res_fn, U):
    r = res_fn(U)
    return 0.5 * float(r @ r)
