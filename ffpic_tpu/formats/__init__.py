from ffpic_tpu.formats.pic import Pic, PixelFormat
from ffpic_tpu.formats.registry import (
    Codec,
    register,
    probe,
    load,
    load_all,
    info,
    encode,
    find_codec,
    registered_codecs,
)

__all__ = [
    "Pic", "PixelFormat", "Codec", "register", "probe", "load", "load_all",
    "info", "encode", "find_codec", "registered_codecs",
]
