"""Named end-to-end code/decoder configurations (the reference's scenarios)."""

from .zoo import MODELS, ModelSpec, get_model

__all__ = ["MODELS", "ModelSpec", "get_model"]
