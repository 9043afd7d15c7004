from .encoder import Encoder, encode_sequence  # noqa: F401
from .params import EncParams, parse_config_file  # noqa: F401
