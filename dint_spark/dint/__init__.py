"""DINT dictionary-based posting-list compression, numpy-vectorized.

Semantics follow the reference engine (dictionary of <=65536 integer
patterns of length 1..16, u16 codewords, reserved codes: 0/1 = 2-/4-byte
exceptions, 2..6 = zero-runs of 256/128/64/32/16; blocks of 256 gaps;
lists/blocks shorter than 256 fall back to binary interpolative coding):
/root/reference/include/dint/dint_codecs.hpp, dint_configuration.hpp,
single_dictionary.hpp. The implementation is new, array-oriented Python.
"""

from dint_spark.dint.codec import (  # noqa: F401
    EXCEPTIONS,
    BLOCK_SIZE,
    MAX_ENTRY_SIZE,
    NUM_ENTRIES,
    RESERVED,
    encode_block,
    decode_block,
    encode_list,
    decode_list,
)
from dint_spark.dint.dictionary import DintDictionary  # noqa: F401
