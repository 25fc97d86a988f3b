"""Model architectures, hparams, loader, registry."""

from .hparams import HParams, hparams_from_gguf
from .llama import llama_forward
from .loader import LoadedModel, load_model
from .registry import get_forward, register, supported_archs

__all__ = [
    "HParams",
    "LoadedModel",
    "get_forward",
    "hparams_from_gguf",
    "llama_forward",
    "load_model",
    "register",
    "supported_archs",
]
