"""BM25 scoring, float32, exactly the reference's non-standard variant.

ref include/ds2i/bm25.hpp:7-25:
  * b = 0.5, k1 = 1.2 (b differs from the textbook 0.75)
  * doc_term_weight = f / (f + k1*(1 - b + b*norm_len))
  * query_term_weight = qf * max(1e-6, ln((N - df + 0.5)/(df + 0.5))) * (1 + k1)
    (idf floored at 1e-6, and the (1+k1) factor folded into the query weight)
  * norm_len = doc_len / avg_doc_len, all arithmetic float32

All helpers take/return numpy float32 so vectorized kernels and the scalar
oracle agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


class BM25:
    b = F32(0.5)
    k1 = F32(1.2)
    epsilon_score = F32(1.0e-6)

    @staticmethod
    def doc_term_weight(freq, norm_len):
        """freq: int array/scalar; norm_len: float32 array/scalar."""
        f = np.asarray(freq).astype(np.float32)
        nl = np.asarray(norm_len).astype(np.float32)
        return f / (f + BM25.k1 * (F32(1.0) - BM25.b + BM25.b * nl))

    @staticmethod
    def query_term_weight(qf: int, df: int, num_docs: int) -> np.float32:
        fdf = F32(df)
        idf = np.log((F32(num_docs) - fdf + F32(0.5)) / (fdf + F32(0.5)),
                     dtype=np.float32)
        return F32(qf) * np.maximum(BM25.epsilon_score, idf) * (F32(1.0) + BM25.k1)

    @staticmethod
    def norm_lens(lens: np.ndarray) -> np.ndarray:
        """ref wand_data ctor: avg over double sum, then float32 divide."""
        avg = F32(np.sum(lens, dtype=np.float64) / len(lens))
        return lens.astype(np.float32) / avg
