"""Seeded, deterministic weight fixture (SURVEY.md §2.1 S5, §7 step 1).

Stand-in for the reference's ``model.tar.gz`` archive (loaded by
AllenNLP ``load_archive`` from ref:dygie/predictors/dygie.py::
DyGIEPredictor). The weights are random-but-frozen (numpy
``default_rng(SEED)`` with a fixed creation order), float32, and small
enough to broadcast to every executor once per job (SURVEY.md §2.1 S2).

A null-label bias makes the argmax decode sparse (most spans/pairs decode
to the null label, index 0), mirroring the reference's label-imbalanced
decode behaviour (SURVEY.md §2.2 F3) and keeping triple volume sane.
"""

from __future__ import annotations

import numpy as np

from dygiepp_spark import config as C

F32 = np.float32

# Re-calibrated (round 4) for the 2-layer LayerNorm encoder: LN fixes
# every token's feature scale, so the decode margins concentrate and
# the old biases sat on the wrong side of the cliff (NER/event decode
# collapsed to ~0, relations exploded). Chosen by sweep on the sf0.001
# corpus to land near the round-3 per-doc rates with all five kinds
# represented (a trained model would learn these; the fixture pins
# them).
NULL_BIAS_NER = 1.4
NULL_BIAS_REL = 0.55
NULL_BIAS_TRIG = 0.8
NULL_BIAS_ARG = 0.8

# Output-LN gain (round 5, M1 fidelity step 3): the residual GELU FFN
# removes the per-block tanh bound, so a final LayerNorm re-pins the
# contextual feature scale. Calibrated by sf0.001 sweep (gain in
# 0.16..0.36, then rel/arg bias fine-tune) to land the per-kind
# decode rates on the round-4 operating point: full sf0.001 corpus
# decodes to 20,898 triples {coref 8395, ner 6028, rel 4208,
# arg 1394, event 873} vs round-4's 21,050 {8395, 5913, 4474, 1319,
# 949} — within 7% per kind, all five kinds represented.
OUT_LN_GAIN = 0.25


def build_weights(seed: int = C.SEED) -> dict[str, np.ndarray]:
    """Create the frozen weight dict. Creation order is part of the
    fixture contract — do not reorder draws."""
    rng = np.random.default_rng(seed)

    def mat(*shape: int) -> np.ndarray:
        scale = 1.0 / np.sqrt(max(shape[-1], 1))
        return (rng.standard_normal(shape) * scale).astype(F32)

    H, D, WD = C.HIDDEN, C.SPAN_DIM, C.WIDTH_DIM
    FH = C.FFN_HIDDEN
    L_ner, L_rel = len(C.NER_LABELS), len(C.REL_LABELS)
    L_trig, L_arg = len(C.TRIGGER_LABELS), len(C.ARG_LABELS)

    w = {
        # round-1 token embedding + 3-gram contextualizer — RETAINED
        # IN THE DRAW ORDER (unused since the round-3 attention
        # encoder) so every later matrix keeps its pinned values
        "tok_emb": mat(C.VOCAB_BUCKETS, H),
        "ctx_w": mat(3 * H, H),
        "ctx_b": np.zeros(H, dtype=F32),
        # span width embedding (X4)
        "width_emb": mat(C.WIDTH_BUCKETS, WD),
        # mention scorer FFN (M4 / ref entity_beam_pruner Pruner)
        "m_w1": mat(D, FH), "m_b1": np.zeros(FH, dtype=F32),
        "m_w2": mat(FH, 1), "m_b2": np.zeros(1, dtype=F32),
        # NER biaffine over (h_start, h_end) + linear over g (M6)
        "ner_u": mat(L_ner, H, H),
        "ner_w": mat(L_ner, D),
        "ner_b": np.zeros(L_ner, dtype=F32),
        # relation biaffine over (g_i, g_j) (M7)
        "rel_u": mat(L_rel, D, D),
        "rel_w": mat(L_rel, 2 * D),
        "rel_b": np.zeros(L_rel, dtype=F32),
        # trigger FFN per token (M8)
        "t_w1": mat(H, FH), "t_b1": np.zeros(FH, dtype=F32),
        "t_w2": mat(FH, L_trig), "t_b2": np.zeros(L_trig, dtype=F32),
        # argument biaffine over (h_trigger, g_span) (M9)
        "arg_u": mat(L_arg, H, D),
        "arg_w": mat(L_arg, H + D),
        "arg_b": np.zeros(L_arg, dtype=F32),
        # coref antecedent bilinear (M10) + propagation gate (M5)
        "cor_u": mat(D, D),
        "f_w": mat(2 * D, D),
        "f_b": np.zeros(D, dtype=F32),
    }
    # wordpiece embedding table (X3/M1) — appended AFTER the original
    # draws so every other matrix keeps its round-1 values; one row
    # per piece of the pinned wordpiece vocab
    from dygiepp_spark.kernel.wordpiece import VOCAB as WP_VOCAB
    w["piece_emb"] = mat(len(WP_VOCAB), H)
    # sliding-window multi-head self-attention encoder (M1) — appended
    # after piece_emb (round-3 draws; earlier matrices keep their
    # values). Position embedding per within-window offset + Q/K/V/
    # output projections (+ attn_f/attn_fb: the round-3 tanh FFN,
    # unused since the round-5 GELU FFN but retained in draw order).
    w["pos_emb"] = mat(C.ATTN_WINDOW, H)
    w["attn_q"] = mat(H, H)
    w["attn_k"] = mat(H, H)
    w["attn_v"] = mat(H, H)
    w["attn_o"] = mat(H, H)
    w["attn_f"] = mat(H, H)
    w["attn_fb"] = np.zeros(H, dtype=F32)
    # second transformer block (M1 fidelity step 2, round 4) —
    # appended after the round-3 draws, same precedent
    w["attn_q2"] = mat(H, H)
    w["attn_k2"] = mat(H, H)
    w["attn_v2"] = mat(H, H)
    w["attn_o2"] = mat(H, H)
    w["attn_f2"] = mat(H, H)  # retained draws (unused since round 5)
    w["attn_fb2"] = np.zeros(H, dtype=F32)
    # M1 fidelity step 3 (round 5): 4x-expansion GELU FFN per block —
    # the standard transformer FFN shape (W2·gelu(W1·LN(x)) with a
    # residual) replacing the square tanh projection. Appended after
    # every round-4 draw so all earlier matrices keep their pinned
    # values; attn_f/attn_f2 stay IN the draw order (now unused) for
    # the same reason.
    w["ffn1_w1"] = mat(H, 4 * H)
    w["ffn1_b1"] = np.zeros(4 * H, dtype=F32)
    w["ffn1_w2"] = mat(4 * H, H)
    w["ffn1_b2"] = np.zeros(H, dtype=F32)
    w["ffn2_w1"] = mat(H, 4 * H)
    w["ffn2_b1"] = np.zeros(4 * H, dtype=F32)
    w["ffn2_w2"] = mat(4 * H, H)
    w["ffn2_b2"] = np.zeros(H, dtype=F32)
    # LayerNorm params (no rng draws, so the fixture draw order above
    # is untouched). Attention-side gains use the standard ones init;
    # FFN-side gains are initialized at 0.25 so the block's tanh
    # output keeps the ~0.2-std feature scale the downstream null-bias
    # calibration was pinned against — a unit-gain LN would inflate
    # every scorer logit ~5x and blow the decode density 16x (a
    # trained model would learn this gain; the fixture must set it).
    for ln in ("ln_a1", "ln_a2"):
        w[f"{ln}_g"] = np.ones(H, dtype=F32)
        w[f"{ln}_b"] = np.zeros(H, dtype=F32)
    for ln in ("ln_f1", "ln_f2"):
        w[f"{ln}_g"] = np.full(H, 0.25, dtype=F32)
        w[f"{ln}_b"] = np.zeros(H, dtype=F32)
    # final output LayerNorm (round 5): with residual FFN sublayers
    # the block output is no longer tanh-bounded, so a trailing LN
    # pins the contextual-feature scale the downstream null-bias
    # calibration was tuned against (a trained model would learn this
    # gain; the fixture sets it — see OUT_LN_GAIN calibration note).
    w["ln_out_g"] = np.full(H, OUT_LN_GAIN, dtype=F32)
    w["ln_out_b"] = np.zeros(H, dtype=F32)
    w["ner_b"][0] = F32(NULL_BIAS_NER)
    w["rel_b"][0] = F32(NULL_BIAS_REL)
    w["t_b2"][0] = F32(NULL_BIAS_TRIG)
    w["arg_b"][0] = F32(NULL_BIAS_ARG)
    return w


_CACHE: dict[int, dict[str, np.ndarray]] = {}


def get_weights(seed: int = C.SEED) -> dict[str, np.ndarray]:
    """Process-local cache — one build per executor python worker (the
    broadcast-once semantics of SURVEY.md §2.1 S2 without shipping
    bytes, since the fixture is derivable from the seed)."""
    if seed not in _CACHE:
        _CACHE[seed] = build_weights(seed)
    return _CACHE[seed]


# --------------------------------------------------------------- S2:
# the literal model-archive path (ref: AllenNLP load_archive on
# model.tar.gz from dygie/predictors/dygie.py::DyGIEPredictor). The
# seeded fixture above is the sandbox default; these functions are
# the real archive surface — a tar.gz whose single member is an npz
# of the weight dict — for deployments shipping trained weights. The
# distribution pattern at scale: save once, `sc.broadcast` the loaded
# dict (tiny), decode UDFs read the broadcast.

def save_archive(w: dict[str, np.ndarray], path: str) -> None:
    """Write the weight dict as model.tar.gz (npz member
    ``weights.npz``). Deterministic down to the FILE BYTES: member
    metadata is pinned AND the gzip wrapper is written with mtime=0
    and no embedded filename (a plain ``tarfile.open(path, 'w:gz')``
    stamps current time + output name into the gzip header, breaking
    content-addressed workflows)."""
    import gzip
    import io
    import tarfile
    buf = io.BytesIO()
    np.savez(buf, **{k: w[k] for k in sorted(w)})
    data = buf.getvalue()
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as t:
        info = tarfile.TarInfo("weights.npz")
        info.size = len(data)
        info.mtime = 0
        t.addfile(info, io.BytesIO(data))
    with open(path, "wb") as f:
        with gzip.GzipFile(filename="", fileobj=f, mode="wb",
                           mtime=0) as gz:
            gz.write(tbuf.getvalue())


def load_archive(path: str) -> dict[str, np.ndarray]:
    """model.tar.gz -> weight dict (float32 arrays)."""
    import io
    import tarfile
    with tarfile.open(path, "r:gz") as t:
        f = t.extractfile("weights.npz")
        assert f is not None, "archive has no weights.npz member"
        npz = np.load(io.BytesIO(f.read()))
        return {k: npz[k] for k in npz.files}


def broadcast_archive(spark, path: str):
    """Load + sc.broadcast — the J6/S2 executor-side distribution of
    an actual trained archive (executors index the broadcast instead
    of re-deriving from a seed)."""
    return spark.sparkContext.broadcast(load_archive(path))
