from tokcodec.codecs.intcodecs import INT_CODECS, decode_ints, encode_ints  # noqa: F401
from tokcodec.codecs.strcodecs import STR_CODECS  # noqa: F401
