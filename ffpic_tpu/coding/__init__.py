"""Host-side entropy coding layer.

Pure-Python reference implementations of every entropy codec the
reference's ``coding/`` layer provides (huffman, deflate, lzw, lz77,
VP8 bool decoder, exp-golomb, CABAC). These define the semantics and
back the unit tests; the production hot paths live in the native C
module ``ffpic_tpu.native`` and are differentially tested against
these.
"""

from ffpic_tpu.coding.huffman import HuffmanTable, HuffmanDecoder, HuffmanEncoder

__all__ = ["HuffmanTable", "HuffmanDecoder", "HuffmanEncoder"]
