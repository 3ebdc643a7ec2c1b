"""documents → sequences: deterministic hash tokenization.

Produces exactly the BASELINE input_hint table shape
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string) from
the ``documents`` testdata table, so the flagship validation pipeline
has a real Ray-native upstream.

Stateful actor-pool stage: the word→token-id cache lives in actor
state (built once, reused across batches); per batch only the UNIQUE
new words are hashed (np.unique + inverse), so the Python-level hash
loop touches a handful of strings per batch regardless of batch size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import as_array

VOCAB = 50_000


def word_token_id(word: str, vocab: int = VOCAB) -> int:
    """Deterministic token id: first 8 bytes of md5, mod vocab."""
    return int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:8],
                          "big") % vocab


class Tokenizer:
    """Callable class for ``map_batches(Tokenizer, concurrency=N)``."""

    def __init__(self, vocab: int = VOCAB, text_col: str = "text",
                 id_col: str = "doc_id", source_col: str = "source"):
        self.vocab = vocab
        self.text_col, self.id_col, self.source_col = text_col, id_col, source_col
        self.cache: dict[str, int] = {}

    def _ids_for(self, words: np.ndarray) -> np.ndarray:
        uniq, inverse = np.unique(words, return_inverse=True)
        ids = np.empty(len(uniq), dtype=np.int32)
        cache = self.cache
        for i, w in enumerate(uniq.tolist()):
            t = cache.get(w)
            if t is None:
                t = word_token_id(w, self.vocab)
                cache[w] = t
            ids[i] = t
        return ids[inverse]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[self.text_col]), r"\s+")
        toks = as_array(toks)
        words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        token_ids = self._ids_for(words) if len(words) else np.empty(0, np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          pa.array(token_ids, type=pa.int32()))
        return pa.table(
            {
                "doc_id": pc.cast(batch[self.id_col], pa.string()),
                "tokens": tokens,
                "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
                "source": pc.cast(batch[self.source_col], pa.string()),
            }
        )


def tokenize_documents(ds, vocab: int = VOCAB, concurrency=4, batch_size: int = 4096):
    """documents Dataset -> sequences Dataset (input_hint shape)."""
    return ds.map_batches(
        Tokenizer,
        fn_constructor_kwargs={"vocab": vocab},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
