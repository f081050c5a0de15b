from .cdf import (
    PRECISION_BITS,
    PRECISION,
    NBINS,
    GRID_BITS,
    GRID,
    lower_bin,
    cdf_bits_np,
    cdf_bits_jnp,
    symbol_freq_np,
)
from .oracle import rans_encode_np, rans_decode_np, roundtrip_np, RANS_L
from .interleaved import (
    interleaved_encode,
    interleaved_decode,
    EncodedStreams,
    pick_num_streams,
)
from .container import pack_streams, unpack_streams, stream_bits
from .coder import (
    encode_tensor,
    decode_tensor,
    encode_latents,
    decode_latents,
    coded_bits,
    real_bpd,
)

__all__ = [
    "PRECISION_BITS",
    "PRECISION",
    "NBINS",
    "GRID_BITS",
    "GRID",
    "lower_bin",
    "cdf_bits_np",
    "cdf_bits_jnp",
    "symbol_freq_np",
    "rans_encode_np",
    "rans_decode_np",
    "roundtrip_np",
    "RANS_L",
    "interleaved_encode",
    "interleaved_decode",
    "EncodedStreams",
    "pick_num_streams",
    "pack_streams",
    "unpack_streams",
    "stream_bits",
    "encode_tensor",
    "decode_tensor",
    "encode_latents",
    "decode_latents",
    "coded_bits",
    "real_bpd",
]
