from sigma_tpu.models.builder import EncoderDecoder, build_model

__all__ = ["EncoderDecoder", "build_model"]
