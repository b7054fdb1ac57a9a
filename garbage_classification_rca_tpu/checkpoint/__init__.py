from .torch_convert import load_torch_state_dict  # noqa: F401
