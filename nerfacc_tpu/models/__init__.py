from .encoders import SinusoidalEncoder
from .hash_encoding import HashEncoder
from .mlp import (
    MLP,
    NerfMLP,
    VanillaNeRFRadianceField,
    DNeRFRadianceField,
)
from .ngp import NGPRadianceField, contract_to_unisphere, trunc_exp
from .tensorf import CPLevel, TensoCPRadianceField, hat_basis

__all__ = [
    "CPLevel",
    "TensoCPRadianceField",
    "hat_basis",
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
