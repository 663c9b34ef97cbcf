from .gn import CompiledSolver, SolverParams  # noqa: F401
