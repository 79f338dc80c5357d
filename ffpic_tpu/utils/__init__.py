from ffpic_tpu.utils.bitstream import BitReader, BitWriter
from ffpic_tpu.utils.checksum import crc32, adler32
from ffpic_tpu.utils.vlog import get_logger

__all__ = ["BitReader", "BitWriter", "crc32", "adler32", "get_logger"]
