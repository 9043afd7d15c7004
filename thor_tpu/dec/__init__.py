from .decoder import Decoder, decode_stream  # noqa: F401
