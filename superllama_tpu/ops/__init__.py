"""Compute ops: jnp reference semantics + Pallas TPU kernels."""

from . import jnp_ref

__all__ = ["jnp_ref"]
