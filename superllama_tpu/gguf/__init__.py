"""GGUF container + ggml quant codecs (format-compatible, original implementation)."""

from .constants import GGML_TYPE_TRAITS, GGMLType, GGUFValueType, Keys, QK_K, row_byte_size
from .quants import DEQUANTIZERS, QUANTIZERS, dequantize, quantize
from .reader import GGUFReader, TensorInfo
from .writer import GGUFWriter

__all__ = [
    "GGML_TYPE_TRAITS",
    "GGMLType",
    "GGUFValueType",
    "GGUFReader",
    "GGUFWriter",
    "Keys",
    "QK_K",
    "TensorInfo",
    "DEQUANTIZERS",
    "QUANTIZERS",
    "dequantize",
    "quantize",
    "row_byte_size",
]
