"""Side-effect import of every format codec — the analog of the
reference's file_ops_init registration table (format/file.c:94-113).
Probe order follows the reference's init order where it matters."""

from ffpic_tpu.formats import jpg  # noqa: F401
from ffpic_tpu.formats import png  # noqa: F401
from ffpic_tpu.formats import gif  # noqa: F401
from ffpic_tpu.formats import webp  # noqa: F401
from ffpic_tpu.formats import bmp  # noqa: F401
from ffpic_tpu.formats import heif  # noqa: F401
from ffpic_tpu.formats import avif  # noqa: F401
from ffpic_tpu.formats import bpg  # noqa: F401
from ffpic_tpu.formats import jp2  # noqa: F401
from ffpic_tpu.formats import svg  # noqa: F401
from ffpic_tpu.formats import pnm  # noqa: F401
from ffpic_tpu.formats import tiff  # noqa: F401
from ffpic_tpu.formats import exr  # noqa: F401
from ffpic_tpu.formats import psd  # noqa: F401
from ffpic_tpu.formats import ico  # noqa: F401
from ffpic_tpu.formats import hevc_raw  # noqa: F401
from ffpic_tpu.formats import tga  # noqa: F401  (no magic; probe last)
