"""Raw-corpus ingestion (S4): the reference's native preprocessing
inputs, re-expressed as distributed Spark scans.

SURVEY.md §2.1 S4 / §3 E3 — the reference preprocesses two raw
formats into document JSON (ref:scripts/data/ace-event/
parse_ace_event.py for ACE05 SGML + APF XML; ref:scripts/data/
get_scierc.sh for the SciERC jsonl archive). This module gives the
engine the same two entry points:

- ACE-style: a directory of `<doc>.sgm` (SGML text) +
  `<doc>.apf.xml` (entity/relation annotations with inclusive char
  offsets). Char offsets are defined over the TAG-STRIPPED,
  entity-unescaped text (``kernel.tokenize.extract_text`` — the same
  frozen rule as the page path, keeping the byte-identical-text
  invariant one function).
- SciERC-style: a zip/tar archive whose members are document-JSON
  jsonl files (doc_key/sentences/ner/relations/clusters).

Scale design: both readers start from ``spark.read.format
("binaryFile")`` — one task per file/archive — and do all parsing
inside ``mapInPandas`` (Arrow-batched, stdlib-only). Nothing is read
on the driver; a 10^6-file ACE-style corpus or a thousand-shard
archive dump parallelizes by input split like any other scan.
Alignment char->token happens here once; downstream everything is
token indices (Document §1.1 convention: document-level indices,
end-inclusive spans).
"""

from __future__ import annotations

import io
import json
import os
import re
import tarfile
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dygiepp_spark.kernel.tokenize import extract_text, tokenize

# output shape shared by both readers — document-JSON as one string
# column, parseable by jsonl.DOC_JSON_SCHEMA via from_json, plus an
# ingest_status column ('ok' | 'unpaired_sgm' | 'unpaired_apf' |
# 'unreadable_archive') so ingestion loss is OBSERVABLE: a corrupt
# archive shard or an orphaned sgm/apf contributes a status row
# instead of silently vanishing (the same stance as the decode path's
# n_truncated lineage and multimodal's decode_status).
_DOC_ROW_SCHEMA = ("doc_key string, dataset string, doc_json string, "
                   "ingest_status string")


def _token_char_spans(text: str) -> list[tuple[int, int]]:
    """Inclusive (start_char, end_char) of every whitespace token of
    `text`, in token order — the char->token alignment table."""
    spans = []
    for m in re.finditer(r"\S+", text):
        spans.append((m.start(), m.end() - 1))
    return spans


def _char_span_to_tokens(spans: list[tuple[int, int]],
                         start: int, end: int) -> tuple[int, int] | None:
    """Inclusive char span -> inclusive (start_tok, end_tok) of the
    tokens overlapping it; None when it falls entirely in whitespace
    or outside the text."""
    toks = [i for i, (s, e) in enumerate(spans)
            if e >= start and s <= end]
    if not toks:
        return None
    return toks[0], toks[-1]


def _group_by_sentence(sent_lens: list[int],
                       items: list[tuple]) -> list[list[list]]:
    """Document-level-token-indexed items -> per-sentence lists (the
    Document JSON ner/relations shape). Items keep document-level
    indices (§1.1); sentence membership is by the span's start."""
    bounds = []
    acc = 0
    for n in sent_lens:
        bounds.append((acc, acc + n - 1))
        acc += n
    out: list[list[list]] = [[] for _ in sent_lens]
    for it in items:
        s = it[0]
        for sid, (lo, hi) in enumerate(bounds):
            if lo <= s <= hi:
                out[sid].append([str(x) for x in it])
                break
    return out


def ace_to_document_json(doc_key: str, sgm_bytes: bytes,
                         apf_bytes: bytes) -> dict:
    """One ACE-style (sgm, apf.xml) pair -> Document JSON dict.

    Entities: <entity TYPE=..> / <entity_mention> / <extent>/<charseq
    START= END=> — charseq offsets are inclusive over the tag-stripped
    sgm text. Relations: <relation TYPE=..> / <relation_mention> with
    two <relation_mention_argument REFID= ROLE=Arg-1|Arg-2>.
    Events: <event TYPE= SUBTYPE=> / <event_mention> with an <anchor>
    charseq (the trigger) and <event_mention_argument REFID= ROLE=>
    entries referencing entity mentions — the defining content of
    ref:scripts/data/ace-event/parse_ace_event.py.
    Output ner entries are [start_tok, end_tok, TYPE]; relations are
    [s1, e1, s2, e2, TYPE]; events are the reference's ragged shape
    [[trigger_tok, TYPE.SUBTYPE], [arg_start, arg_end, ROLE], ...]
    with the trigger as the anchor's FIRST token (the reference
    collapses multi-token anchors to one trigger token); indices
    document-level, end-inclusive.
    """
    from dygiepp_spark.kernel.tokenize import doc_to_sentences
    text = extract_text(sgm_bytes)
    spans = _token_char_spans(text)
    sentences = doc_to_sentences(text)
    sent_lens = [len(s) for s in sentences]

    root = ElementTree.fromstring(apf_bytes)
    # mention id -> (tok_start, tok_end); entity id -> TYPE
    mention_tok: dict[str, tuple[int, int]] = {}
    ner_items: list[tuple] = []
    for ent in root.iter("entity"):
        etype = ent.get("TYPE", "ENT")
        for em in ent.iter("entity_mention"):
            cs = em.find("./extent/charseq")
            if cs is None:
                continue
            ts = _char_span_to_tokens(spans, int(cs.get("START")),
                                      int(cs.get("END")))
            if ts is None:
                continue
            mention_tok[em.get("ID", "")] = ts
            ner_items.append((ts[0], ts[1], etype))

    rel_items: list[tuple] = []
    for rel in root.iter("relation"):
        rtype = rel.get("TYPE", "REL")
        for rm in rel.iter("relation_mention"):
            args = {}
            for a in rm.iter("relation_mention_argument"):
                args[a.get("ROLE", "")] = a.get("REFID", "")
            a1 = mention_tok.get(args.get("Arg-1", ""))
            a2 = mention_tok.get(args.get("Arg-2", ""))
            if a1 and a2:
                rel_items.append((a1[0], a1[1], a2[0], a2[1], rtype))

    event_items: list[tuple[int, list[list[str]]]] = []
    for ev in root.iter("event"):
        etype = ev.get("TYPE", "EVT")
        sub = ev.get("SUBTYPE")
        label = f"{etype}.{sub}" if sub else etype
        for em in ev.iter("event_mention"):
            anchor = em.find("./anchor/charseq")
            if anchor is None:
                continue
            ts = _char_span_to_tokens(spans, int(anchor.get("START")),
                                      int(anchor.get("END")))
            if ts is None:
                continue
            trigger = ts[0]
            entry: list[list[str]] = [[str(trigger), label]]
            for a in em.iter("event_mention_argument"):
                at = mention_tok.get(a.get("REFID", ""))
                if at is None:
                    continue
                entry.append([str(at[0]), str(at[1]),
                              a.get("ROLE", "ARG")])
            event_items.append((trigger, entry))

    return {
        "doc_key": doc_key,
        "dataset": "ace_style",
        "sentences": sentences,
        "ner": _group_by_sentence(sent_lens, sorted(set(ner_items))),
        "relations": _group_by_sentence(sent_lens,
                                        sorted(set(rel_items))),
        "events": _group_events_by_sentence(sent_lens, event_items),
    }


def _group_events_by_sentence(
        sent_lens: list[int],
        events: list[tuple[int, list[list[str]]]]) -> list[list]:
    """(trigger_tok, ragged event entry) -> per-sentence event lists
    keyed by the trigger's sentence (the reference's events JSON
    nesting), deterministic order (trigger asc, then entry)."""
    bounds = []
    acc = 0
    for n in sent_lens:
        bounds.append((acc, acc + n - 1))
        acc += n
    out: list[list] = [[] for _ in sent_lens]
    for trig, entry in sorted(events, key=lambda e: (e[0], e[1])):
        for sid, (lo, hi) in enumerate(bounds):
            if lo <= trig <= hi:
                out[sid].append(entry)
                break
    return out


def read_ace_corpus(spark: SparkSession, dir_path: str) -> DataFrame:
    """Directory of *.sgm + *.apf.xml -> document-JSON DataFrame
    (same columns as jsonl.read_document_jsonl, plus ingest_status).
    Distributed: the binaryFile scan is one task per file; sgm/apf
    pairing is an equi-join on the basename (tiny keys); parsing is
    Arrow-batched.

    The pairing join is FULL OUTER: an orphaned sgm (missing
    annotations) or apf (missing text) surfaces as a row with
    ingest_status='unpaired_sgm'/'unpaired_apf' and null document
    fields, instead of being silently dropped — filter
    ingest_status = 'ok' for the clean corpus, aggregate the rest for
    the ingestion-loss report."""
    files = (spark.read.format("binaryFile")
             .load(os.path.join(dir_path, "*"))
             .select(F.col("path"), F.col("content")))
    base = F.regexp_replace(
        F.element_at(F.split("path", "/"), -1),
        r"\.(sgm|apf\.xml)$", "")
    sgm = (files.filter(F.col("path").endswith(".sgm"))
           .select(base.alias("doc_key"),
                   F.col("content").alias("sgm")))
    apf = (files.filter(F.col("path").endswith(".apf.xml"))
           .select(base.alias("doc_key"),
                   F.col("content").alias("apf")))
    paired = sgm.join(apf, "doc_key", "full")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.apf is None:
                    rows.append((r.doc_key, None, None, "unpaired_sgm"))
                    continue
                if r.sgm is None:
                    rows.append((r.doc_key, None, None, "unpaired_apf"))
                    continue
                d = ace_to_document_json(r.doc_key, bytes(r.sgm),
                                         bytes(r.apf))
                rows.append((r.doc_key, d["dataset"], json.dumps(d),
                             "ok"))
            yield pd.DataFrame(
                rows, columns=["doc_key", "dataset", "doc_json",
                               "ingest_status"])

    return _doc_rows_to_df(paired.mapInPandas(parse, _DOC_ROW_SCHEMA))


def scierc_archive_members(
        blob: bytes) -> tuple[list[tuple[str, bytes]], str]:
    """((member_name, member_bytes) for every *.jsonl member of a zip
    or tar(.gz) archive blob, status) — stdlib only, runs inside
    executors. status is 'ok' or 'unreadable_archive': a corrupt or
    unrecognized shard must be COUNTABLE by the caller, not silently
    an empty member list."""
    out: list[tuple[str, bytes]] = []
    bio = io.BytesIO(blob)
    try:
        if zipfile.is_zipfile(bio):
            bio.seek(0)
            with zipfile.ZipFile(bio) as z:
                for name in z.namelist():
                    if name.endswith(".jsonl"):
                        out.append((name, z.read(name)))
            return out, "ok"
        bio.seek(0)
        with tarfile.open(fileobj=bio, mode="r:*") as t:
            for m in t.getmembers():
                if m.isfile() and m.name.endswith(".jsonl"):
                    f = t.extractfile(m)
                    if f is not None:
                        out.append((m.name, f.read()))
        return out, "ok"
    except (tarfile.TarError, zipfile.BadZipFile, OSError, EOFError):
        return [], "unreadable_archive"


def read_scierc_archive(spark: SparkSession, path: str) -> DataFrame:
    """SciERC-style zip/tar of jsonl shards -> document-JSON
    DataFrame (same columns as read_document_jsonl). One task per
    archive file; a sharded dump (the usual layout at scale)
    parallelizes across archives, and each line stays a self-
    contained document — no cross-task state."""
    # keep `path` alongside `content`: a non-ok status row carries the
    # shard's basename as its doc_key, so ingestion-loss reports can
    # attribute failures to a file (multiple corrupt shards would
    # otherwise all collide on an empty doc_key)
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                members, status = scierc_archive_members(
                    bytes(r.content))
                if status != "ok":
                    rows.append((str(r.path).rsplit("/", 1)[-1],
                                 None, None, status))
                    continue
                for _name, data in members:
                    for line in data.decode("utf-8").splitlines():
                        if not line.strip():
                            continue
                        d = json.loads(line)
                        rows.append((d.get("doc_key", ""),
                                     d.get("dataset", "scierc_style"),
                                     line, "ok"))
            yield pd.DataFrame(
                rows, columns=["doc_key", "dataset", "doc_json",
                               "ingest_status"])

    return _doc_rows_to_df(files.mapInPandas(parse, _DOC_ROW_SCHEMA))


def _doc_rows_to_df(rows: DataFrame) -> DataFrame:
    """(doc_key, dataset, doc_json string, ingest_status) -> the
    read_document_jsonl output contract (doc_key, dataset, sentences,
    text, gold arrays) + ingest_status. Non-'ok' rows keep their
    doc_key/status with null document fields — observable loss."""
    from dygiepp_spark.sources.jsonl import DOC_JSON_SCHEMA
    parsed = rows.select(
        "doc_key", "ingest_status",
        F.from_json("doc_json", DOC_JSON_SCHEMA).alias("d"))
    return parsed.select(
        "doc_key",
        F.col("d.dataset").alias("dataset"),
        F.col("d.sentences").alias("sentences"),
        F.array_join(F.flatten("d.sentences"), " ").alias("text"),
        F.col("d.ner").alias("ner"),
        F.col("d.relations").alias("relations"),
        F.col("d.clusters").alias("clusters"),
        F.col("d.events").alias("events"),
        "ingest_status")
