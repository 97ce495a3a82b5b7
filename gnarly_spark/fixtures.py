"""Deterministic CDC-changelog fixtures (generator + pure-pandas oracle).

Mirrors the reference's test factories: the seeded chain/fork builder at
packages/gnarly-core/test/Blockstream.spec.ts:13-33 and the block/tx rosie
factories under test/factories/, re-expressed in the Common-Crawl CDC domain
of FIXTURES.md (F2 changelog schema, F3 fork rules, F6 golden html, F7 skew).

Everything is seeded — same args => byte-identical output. No wall clock,
no uuid4 (the reference uses uuid.v4 at src/utils.ts:126; we derive ids
deterministically so golden tests are possible).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from gnarly_spark.functions.extraction import extract_text

EPOCH = pd.Timestamp("2024-01-01 00:00:00")
LANGS = ["en", "de", "fr", "es"]

CHANGELOG_COLUMNS = [
    "op_seq", "block_id", "block_hash", "parent_hash", "op", "url",
    "warc_ts", "html", "lang", "revert_of_block", "reason",
]

# Spark-side schema of the changelog (FIXTURES.md F2).
CHANGELOG_DDL = (
    "op_seq long, block_id long, block_hash string, parent_hash string, "
    "op string, url string, warc_ts timestamp, html binary, lang string, "
    "revert_of_block string, reason string"
)


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def block_hash(block_id: int, fork_id: int = 0) -> str:
    """Deterministic stand-in for a block hash (FIXTURES.md F2)."""
    return _h(f"block:{fork_id}:{block_id}")


def url_for(i: int, n_sites: int = 10) -> str:
    return f"https://site-{i % n_sites}.example/page/{i}"


def lang_for(url: str) -> str:
    return LANGS[int(_h("lang:" + url), 16) % len(LANGS)]


def html_for(url: str, op_seq: int) -> bytes:
    """Deterministic templated html for (url, version) — FIXTURES.md F6.

    Includes script/style/comment/entity cases so extraction is exercised.
    """
    h = _h(f"html:{url}:{op_seq}")
    words = [h[i : i + 4] for i in range(0, 16, 4)]
    body = " ".join(
        f"<p>para {w} of {url} v{op_seq} &amp; more &lt;raw&gt;</p>" for w in words
    )
    return (
        f"<html><head><title>{url} v{op_seq}</title>"
        f"<style>.x{{color:red}}</style>"
        f"<script>var v={op_seq};</script></head>"
        f"<!-- crawl {h} -->"
        f"<body><h1>Page&nbsp;{h}</h1>{body}</body></html>"
    ).encode("utf-8")


@dataclass
class ChainBuilder:
    """Seeded block/event chain builder with fork support.

    Port of the *behavior* of buildChain/blockAfter/genesis
    (test/Blockstream.spec.ts:13-33): a linear chain whose blocks carry
    change events, plus short-lived forks that are later reverted —
    emitted as explicit ``op='revert'`` rows (our data-not-control-flow
    reorg model, SURVEY.md §3.3).
    """

    seed: int = 42
    events_per_block: int = 5
    n_urls: int = 40
    n_sites: int = 10
    zipf_s: float | None = None  # FIXTURES.md F7: Zipf-skewed urls
    update_delete_split: float = 0.85  # P(update) for a live url

    rows: list[dict] = field(default_factory=list)
    op_seq: int = 0
    block_id: int = 0
    _live: set = field(default_factory=set)
    # fork_id -> hash of that chain's last emitted block, so fork blocks
    # chain off their ACTUAL predecessor (a canonical-hash parent on a
    # depth>=2 fork names a block that was never emitted)
    _tips: dict = field(default_factory=dict)

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        if self.zipf_s is not None:
            ranks = np.arange(1, self.n_urls + 1, dtype=float)
            w = ranks ** (-self.zipf_s)
            self._url_p = w / w.sum()
        else:
            self._url_p = None

    def _pick_url(self) -> str:
        i = int(self.rng.choice(self.n_urls, p=self._url_p))
        return url_for(i, self.n_sites)

    def add_block(self, fork_id: int = 0, n_events: int | None = None) -> str:
        """Append one block of change events; returns its block_hash."""
        bh = block_hash(self.block_id, fork_id)
        # parent = this chain's own tip; a new fork branches off canonical
        ph = self._tips.get(fork_id, self._tips.get(0, "genesis"))
        base_ts = EPOCH + pd.Timedelta(seconds=60 * self.block_id)
        for j in range(n_events if n_events is not None else self.events_per_block):
            url = self._pick_url()
            if url not in self._live:
                op, reason = "insert", "PAGE_CRAWLED"
                self._live.add(url)
            elif self.rng.random() < self.update_delete_split:
                op, reason = "update", "PAGE_RECRAWLED"
            else:
                op, reason = "delete", "PAGE_DELETED"
                self._live.discard(url)
            self.op_seq += 1
            self.rows.append({
                "op_seq": self.op_seq,
                "block_id": self.block_id,
                "block_hash": bh,
                "parent_hash": ph,
                "op": op,
                "url": url,
                # intra-block events share coarse time; op_seq breaks ties
                # (tests the LWW (warc_ts, op_seq) ordering contract)
                "warc_ts": base_ts + pd.Timedelta(seconds=int(j // 2)),
                "html": html_for(url, self.op_seq) if op != "delete" else None,
                "lang": lang_for(url),
                "revert_of_block": None,
                "reason": reason,
            })
        self.block_id += 1
        self._tips[fork_id] = bh
        return bh

    def revert_blocks(self, hashes: list[str]) -> None:
        """Emit revert events undoing previously-applied blocks.

        The analog of onBlockInvalidated -> rollbackTransaction
        (Blockstream.ts:179-194, Ourbit.ts:112-115,152-167), carried as
        data so replay and incremental processing share one code path.
        """
        bh = block_hash(self.block_id, 0)
        # the reverting block rejoins the CANONICAL chain: its parent is
        # the canonical tip, never the dead fork blocks it undoes
        ph = self._tips.get(0, "genesis")
        ts = EPOCH + pd.Timedelta(seconds=60 * self.block_id)
        for h in hashes:
            self.op_seq += 1
            self.rows.append({
                "op_seq": self.op_seq,
                "block_id": self.block_id,
                "block_hash": bh,
                "parent_hash": ph,
                "op": "revert",
                "url": None,
                "warc_ts": ts,
                "html": None,
                "lang": None,
                "revert_of_block": h,
                "reason": "ROLLBACK",
            })
        self.block_id += 1
        self._tips = {0: bh}  # forks are dead past their revert

    def fork(self, depth: int, extra: int = 1) -> None:
        """Short-lived fork of ``depth`` blocks, then revert + replacement.

        FIXTURES.md F3 / Blockstream.spec.ts:249-277: emit fork blocks
        (fork_id=1), revert them, then emit ``depth + extra`` replacement
        blocks on the canonical chain. State mutated by fork blocks is
        rolled back implicitly by the LWW/fold semantics.
        """
        saved_live = set(self._live)
        fork_hashes = [self.add_block(fork_id=1) for _ in range(depth)]
        self._live = saved_live  # fork effects are undone
        self.revert_blocks(fork_hashes)
        for _ in range(depth + extra):
            self.add_block(fork_id=0)

    def to_pandas(self) -> pd.DataFrame:
        df = pd.DataFrame(self.rows, columns=CHANGELOG_COLUMNS)
        return df.astype({"op_seq": "int64", "block_id": "int64"})


def gen_changelog(
    n_blocks: int = 20,
    events_per_block: int = 5,
    seed: int = 42,
    fork_depth: int = 0,
    n_urls: int | None = None,
    zipf_s: float | None = None,
) -> pd.DataFrame:
    """One-call fixture: linear chain, optionally ending in a reorg."""
    b = ChainBuilder(
        seed=seed,
        events_per_block=events_per_block,
        n_urls=n_urls or max(4, n_blocks * events_per_block // 3),
        zipf_s=zipf_s,
    )
    for _ in range(n_blocks):
        b.add_block()
    if fork_depth:
        b.fork(fork_depth)
    return b.to_pandas()


def oracle_final_state(changelog: pd.DataFrame, with_text: bool = True) -> pd.DataFrame:
    """Pure-pandas oracle: the final pages table after full replay.

    Semantics (the normative spec; SURVEY.md §3.3):
      1. a block named by any revert event is excluded entirely;
      2. among remaining non-revert events, the last writer per url wins,
         ordered by (warc_ts, op_seq);
      3. a winning 'delete' means the url is absent.
    Output: (url, warc_ts, html, text, lang) sorted by url — FIXTURES.md F1.
    """
    reverted = set(changelog.loc[changelog["op"] == "revert", "revert_of_block"].dropna())
    ev = changelog[(changelog["op"] != "revert") & (~changelog["block_hash"].isin(reverted))]
    ev = ev.sort_values(["warc_ts", "op_seq"], kind="mergesort")
    last = ev.groupby("url", as_index=False).tail(1)
    live = last[last["op"] != "delete"].copy()
    if with_text:
        live["text"] = live["html"].map(extract_text)
    cols = ["url", "warc_ts", "html", "text", "lang"] if with_text else ["url", "warc_ts", "html", "lang"]
    return live[cols].sort_values("url").reset_index(drop=True)


def oracle_fold(page_edits: pd.DataFrame, changelog: pd.DataFrame | None = None) -> pd.DataFrame:
    """Oracle for the abelian fold (FIXTURES.md F4, erc20-analog).

    total_bytes(url) = sum of deltas over non-reverted events; reverts
    commute out by re-summation (gnarly-reducer-erc20/src/reducer.ts:81-90).
    """
    ev = page_edits
    if changelog is not None:
        reverted = set(changelog.loc[changelog["op"] == "revert", "revert_of_block"].dropna())
        ev = ev[~ev["block_hash"].isin(reverted)]
    out = ev.groupby("url", as_index=False)["delta_bytes"].sum()
    return out.rename(columns={"delta_bytes": "total_bytes"}).sort_values("url").reset_index(drop=True)


def gen_page_edits(n_blocks: int = 50, events_per_block: int = 10, seed: int = 43) -> pd.DataFrame:
    """FIXTURES.md F4: signed content-size deltas per url."""
    rng = np.random.default_rng(seed)
    n_urls = max(4, n_blocks * events_per_block // 5)
    rows = []
    seq = 0
    for b in range(n_blocks):
        for _ in range(events_per_block):
            seq += 1
            rows.append({
                "op_seq": seq,
                "block_hash": block_hash(b),
                "url": url_for(int(rng.integers(n_urls))),
                "delta_bytes": int(rng.integers(-5000, 5000)),
                "warc_ts": EPOCH + pd.Timedelta(seconds=60 * b),
            })
    return pd.DataFrame(rows)
