"""thallo_tpu: a TPU-native framework for large-scale nonlinear
least-squares optimization.

A from-scratch JAX/XLA re-design with the capabilities of the reference
Thallo system (a Terra/CUDA DSL + compiler for Gauss-Newton/LM + PCG
solvers over image-grid and graph-structured energies).  The compute path
is jnp/jvp/vjp/vmap under jit (with Pallas kernels for hot spots); the
reference's symbolic autodiff and PTX codegen are replaced by JAX tracing
and the XLA TPU backend; scaling beyond one chip uses jax.sharding meshes
(a capability the reference never had).
"""
from .dims import Dim, IndexDomain
from .expr import ExpVector
from .lib_env import load_energy, load_energy_file, make_env
from .plan import Plan
from .spec import Energy, JTJpSchedule, NamedResidual, ProblemSpec
from .typesys import (  # noqa: F401
    VecType,
    float1,
    float2,
    float3,
    float4,
    float6,
    float9,
    mat3f,
)

__version__ = "0.2.0"

__all__ = [
    "Dim",
    "IndexDomain",
    "ExpVector",
    "ProblemSpec",
    "Energy",
    "NamedResidual",
    "JTJpSchedule",
    "Plan",
    "load_energy",
    "load_energy_file",
    "make_env",
]
