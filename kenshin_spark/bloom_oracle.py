"""Shared DuckDB oracle text for the relational Bloom-filter rows.

Standalone module (imports nothing from the query banks) so BOTH the
r9 and r10 banks can use it without a forward import between banks —
a bank importing a LATER bank deadlocks on executors once the earlier
bank is promoted (queries.py bottom imports r9 -> r9 imports r10 ->
r10 imports queries.py, partially initialized; surfaced as a
worker-side ImportError in cloudpickled UDFs)."""

from __future__ import annotations

#: DuckDB replay of the seeded 60-bit md5 position hash
_BLOOM_POS = (
    "CAST(('0x' || substr(md5(CAST({i} AS VARCHAR) || '|' || fp), 1, 15)) "
    "AS BIGINT) % {mbits}"
)


def _bloom_oracle(m_words: int, k: int) -> str:
    mbits = m_words * 62
    pos_union = "\nUNION ALL\n".join(
        f"SELECT fp, {_BLOOM_POS.format(i=i, mbits=mbits)} AS pos FROM fps"
        for i in range(k)
    )
    bpos_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, fp, {_BLOOM_POS.format(i=i, mbits=mbits)} AS pos "
        "FROM batch"
        for i in range(k)
    )
    return f"""
    WITH corpus AS (
      SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 <> 0
    ),
    fps AS (SELECT DISTINCT fp FROM corpus),
    pos AS ({pos_union}),
    bitmap AS (
      SELECT pos // 62 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT)) AS bits
      FROM pos GROUP BY 1
    ),
    batch AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 10 = 0 THEN text || ' novel'
                      ELSE text END) AS fp
      FROM documents WHERE doc_id % 10 IN (0, 1)
    ),
    bpos AS ({bpos_union}),
    probed AS (
      SELECT p.doc_id,
             count(*) = sum(CASE WHEN
               (bm.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 62 AS INT)))
               <> 0 THEN 1 ELSE 0 END) AS bloom_hit
      FROM bpos p LEFT JOIN bitmap bm ON bm.word = p.pos // 62
      GROUP BY p.doc_id
    ),
    cfps AS (SELECT DISTINCT fp FROM corpus)
    SELECT b.doc_id, pr.bloom_hit,
           b.fp IN (SELECT fp FROM cfps) AS exact_dup
    FROM batch b JOIN probed pr ON pr.doc_id = b.doc_id
    """
