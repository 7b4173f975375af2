"""Asset pipeline: PLY/SPZ import, chunked quantized assets, export."""

from .formats import ColorFormat, QualityPreset, SHFormat, VectorFormat
from .asset import GaussianSplatAssetData, decode_asset, encode_asset, load_asset, save_asset

__all__ = [
    "ColorFormat",
    "QualityPreset",
    "SHFormat",
    "VectorFormat",
    "GaussianSplatAssetData",
    "decode_asset",
    "encode_asset",
    "load_asset",
    "save_asset",
]
