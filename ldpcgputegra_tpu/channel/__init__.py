"""Channel, modulation, and encoding stages (reference components C1-C6)."""

from .awgn import AwgnChannel, ChannelSpec, sigma_for_snr
from .encoder import (
    Encoder,
    FakeEncoder,
    GF2Encoder,
    QCAccumulateEncoder,
    StaircaseEncoder,
    make_encoder,
)
from .bitgen import generate_info_bits

__all__ = [
    "AwgnChannel",
    "ChannelSpec",
    "sigma_for_snr",
    "Encoder",
    "FakeEncoder",
    "GF2Encoder",
    "QCAccumulateEncoder",
    "StaircaseEncoder",
    "make_encoder",
    "generate_info_bits",
]
