from .encoders import SinusoidalEncoder
from .hash_encoding import HashEncoder
from .mlp import (
    MLP,
    NerfMLP,
    VanillaNeRFRadianceField,
    DNeRFRadianceField,
)
from .ngp import NGPRadianceField, contract_to_unisphere, trunc_exp

__all__ = [
    "SinusoidalEncoder",
    "HashEncoder",
    "MLP",
    "NerfMLP",
    "VanillaNeRFRadianceField",
    "DNeRFRadianceField",
    "NGPRadianceField",
    "contract_to_unisphere",
    "trunc_exp",
]
