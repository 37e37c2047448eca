"""Self-contained tokenization (no transformers/sentencepiece dependency).

The reference ships its tokenizers through the HF pipeline
(RepText/pipeline_flux_controlnet.py:194-226: CLIPTokenizer + T5TokenizerFast
loaded by from_pretrained). Here both are vendored pure-Python so the runtime
is dependency-free: a CLIP byte-BPE (vocab.json + merges.txt) and a
SentencePiece unigram encoder with a protobuf-wire-format reader for
spiece.model.
"""

from reptext_tpu.text.clip_bpe import CLIPBPETokenizer  # noqa: F401
from reptext_tpu.text.spm import SentencePieceUnigram  # noqa: F401
