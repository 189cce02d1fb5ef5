"""Model / pipeline configuration constants.

Mirrors the reference's shipped-config hyperparameters where they are
semantics-bearing (SURVEY.md §1.2, FIXTURES.md §2):

- ``max_span_width=8`` — ref:dygie/data/dataset_readers/dygie.py::
  DyGIEReader (AllenNLP ``enumerate_spans`` call) [BASELINE].
- ``spans_per_word=0.5`` (relation beam) / ``0.3`` (coref beam) —
  ref:dygie/models/entity_beam_pruner.py::Pruner via
  ref:training_config/template.libsonnet.
- propagation iters T=2 — ref:dygie/models/coref.py::
  CorefResolver.coref_propagation (``coref_prop`` config key).

Everything else (hidden sizes, label vocabularies) is fixture-scale per
FIXTURES.md §2; the seams are identical at real scale, only the weight
shapes grow.
"""

from __future__ import annotations

SEED = 42

# --- span enumeration / pruning (semantics-bearing) ---
MAX_SPAN_WIDTH = 8
SPANS_PER_WORD = 0.5        # relation/NER beam fraction (lambda)
COREF_SPANS_PER_WORD = 0.3  # coref beam fraction
PROP_ITERS = 2              # graph-propagation iterations T

# --- tokenizer (deterministic, SQL-mirrorable; SURVEY.md §2.7 X2) ---
SENT_CHUNK = 16             # max tokens per sentence (fallback split)
MAX_DOC_TOKENS = 20_000     # per-document decode cap (straggler guard:
                            # a pathological multi-hundred-k-token page
                            # must not pin one task for minutes; ~10s
                            # worst-case at measured single-core rate)
SENT_PUNCT = (".", "!", "?")

# --- model dims (fixture-scale) ---
HIDDEN = 32                 # token embedding / contextual dim H
ATTN_WINDOW = 64            # sliding-window self-attention span (the
                            # BERT-style max_length chunk of the
                            # reference's transformer embedder — long
                            # documents are encoded window-by-window)
ATTN_HEADS = 4              # attention heads (HIDDEN % ATTN_HEADS == 0)
WIDTH_BUCKETS = 8           # span-width embedding buckets
WIDTH_DIM = 8               # span-width embedding dim
FFN_HIDDEN = 32             # feedforward hidden dim
VOCAB_BUCKETS = 4096        # hashed token-embedding rows
SPAN_DIM = 2 * HIDDEN + WIDTH_DIM  # g = [h_start; h_end; width_emb]

# --- label vocabularies (index 0 = null label "", FIXTURES.md §2) ---
NER_LABELS = ["", "Method", "Material", "Task", "Generic"]
REL_LABELS = ["", "USED-FOR", "PART-OF", "COMPARE"]
TRIGGER_LABELS = ["", "Use", "Create"]
ARG_LABELS = ["", "Agent", "Instrument", "Theme"]

# --- pipeline ---
N_WARC_PARTITIONS = 8       # stand-in WARC partition count for lineage/resume
ARROW_DOCS_PER_BATCH = 64   # Arrow batch sizing for the decode UDF

# --- entity linking (SURVEY.md §2.3 J5, §2.7 X7) ---
LSH_BANDS = 4
LSH_ROWS_PER_BAND = 4       # k = bands * rows minhashes
LSH_SHINGLE_K = 3           # character shingle width for mention text
LINK_JACCARD_THRESHOLD = 0.6
CC_MAX_ITERS = 12           # bounded label-propagation iterations
