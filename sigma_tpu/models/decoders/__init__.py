from sigma_tpu.models.decoders.mamba_decoder import MambaDecoder
from sigma_tpu.models.decoders.mlp_decoder import MLPDecoder

__all__ = ["MambaDecoder", "MLPDecoder"]
