from .bal import load_bal, save_bal, bal_to_inputs  # noqa: F401
