"""Asset pipeline: PLY/SPZ import, chunked quantized assets, export."""

from .formats import ColorFormat, QualityPreset, SHFormat, VectorFormat
from .asset import GaussianSplatAssetData, decode_asset, encode_asset, load_asset, save_asset
from .bridge import gaussians_to_input_splats, input_splats_to_gaussians
from .creator import create_asset
from .ply import read_ply, write_ply
from .spz import read_spz, write_spz

__all__ = [
    "gaussians_to_input_splats",
    "input_splats_to_gaussians",
    "create_asset",
    "read_ply",
    "write_ply",
    "read_spz",
    "write_spz",
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
