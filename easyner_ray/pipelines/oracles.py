"""DuckDB oracle SQL for every oracle-checkable query in
:mod:`easyner_ray.pipelines.queries`.

Relational queries run against the driver's pre-registered views (region,
nation, customer, supplier, part, orders, lineitem, events, documents,
embeddings). KG queries read the synthetic corpus' GOLD parquet tables
directly (absolute paths under /tmp/easyner_synth/sf0.01 — the driver's
correctness pass runs at sf=0.01; :func:`oracle_sql` materializes that
corpus idempotently before returning so the files always exist).

Floats that are order-of-summation-sensitive are rounded to 4 decimals on
both sides; ratio columns (int/int in float64) are bit-exact without
rounding because IEEE division of exactly-representable operands is
correctly rounded in both engines.
"""

from __future__ import annotations

SYNTH = "/tmp/easyner_synth/sf0.01"
GM = f"read_parquet('{SYNTH}/gold_mentions.parquet')"
GS = f"read_parquet('{SYNTH}/gold_sentences.parquet')"
TR = f"read_parquet('{SYNTH}/transcripts.parquet')"
AL = f"read_parquet('{SYNTH}/alias.parquet')"

RELATIONAL = {
    "agg_lineitem_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "join_orders_customer_nation": """
        SELECT n_name,
               round(sum(o_totalprice), 4) AS total_price,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "top_parts_by_revenue": """
        SELECT l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem GROUP BY l_partkey
        ORDER BY revenue DESC, l_partkey LIMIT 10
    """,
    "orders_priority_count": """
        SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority
    """,
    "semi_join_large_parts": """
        SELECT l_partkey, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        GROUP BY l_partkey
    """,
    "events_stats": """
        SELECT event_type,
               round(sum(value), 4) AS sum_value,
               round(avg(value), 4) AS avg_value,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "events_top_users": """
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        ORDER BY n DESC, user_id LIMIT 20
    """,
    "nations_sorted": """
        SELECT r_name, n_name, n_nationkey
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY r_name, n_name
    """,
    "dedup_exact_docs": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "docs_export_shards": """
        SELECT doc_id,
               ((doc_id * 2654435761) % 4294967296) % 8 AS shard,
               (doc_id * 2246822519) % 4294967296 AS sort_key
        FROM documents
    """,
    "docs_cap_per_source": """
        SELECT source, doc_id, rn FROM (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * 2246822519) % 4294967296, doc_id)
                   AS rn
          FROM documents) WHERE rn <= 10
    """,
    "docs_source_report": """
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '[^\\s]+')))
                    AS BIGINT) AS n_tokens,
               count(DISTINCT md5(text)) AS n_distinct
        FROM documents GROUP BY source
    """,
    "docs_snapshot_diff": """
        WITH old AS (SELECT doc_id, md5(text) AS fp FROM documents),
        new AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN md5(text || ' v2')
                      ELSE md5(text) END AS fp
          FROM documents WHERE doc_id % 11 <> 0
          UNION ALL
          SELECT doc_id + 1000000, md5(text || ' new')
          FROM documents WHERE doc_id % 17 = 0)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
    """,
    "docs_token_budget": """
        WITH w AS (
          SELECT doc_id, source,
                 (doc_id * 2246822519) % 4294967296 AS h,
                 len(regexp_extract_all(text, '[^\\s]+')) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY source
                                         ORDER BY h, doc_id) AS cum
              FROM w)
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM c WHERE cum <= 800
    """,
    "docs_dedup_keep_best": """
        WITH scored AS (
            SELECT doc_id, text,
                   (doc_id * 2654435761) % 4294967296 AS score
            FROM documents)
        SELECT doc_id, score, n_copies FROM (
            SELECT doc_id, score,
                   row_number() OVER (PARTITION BY text
                                      ORDER BY score DESC, doc_id) AS rn,
                   count(*) OVER (PARTITION BY text) AS n_copies
            FROM scored) WHERE rn = 1
    """,
    "docs_epoch_mix": """
        WITH e AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src0' THEN 2.4
                             WHEN 'src1' THEN 1.0
                             WHEN 'src2' THEN 0.5
                             ELSE 0.0 END AS ep,
                 (doc_id * 2654435761) % 4294967296 AS h
          FROM documents),
        n AS (
          SELECT doc_id, source,
                 CAST(floor(ep) AS BIGINT)
                 + CASE WHEN h < CAST((ep - floor(ep)) * 4294967296
                                      AS BIGINT)
                        THEN 1 ELSE 0 END AS reps
          FROM e)
        SELECT doc_id, source, unnest(generate_series(0, reps - 1))
                 AS epoch_idx
        FROM n WHERE reps > 0
    """,
    "docs_mixture_sample": """
        SELECT doc_id, source FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 <
              CASE source
                WHEN 'src0' THEN CAST(0.8 * 4294967296 AS BIGINT)
                WHEN 'src1' THEN CAST(0.5 * 4294967296 AS BIGINT)
                WHEN 'src2' THEN CAST(0.1 * 4294967296 AS BIGINT)
                ELSE 0 END
    """,
    "dedup_exact_incremental": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents d WHERE doc_id % 2 <> 0
        GROUP BY text
        HAVING NOT EXISTS (SELECT 1 FROM documents o
                           WHERE o.doc_id % 2 = 0 AND o.text = d.text)
    """,
    "doc_stats": """
        SELECT doc_id,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[^\\s]+')) AS n_tokens,
               len(regexp_extract_all(text,
                 chr(39) || '(?:[sdmt]|ll|ve|re)| ?[\\pL]+| ?[\\pN]+| ?[^\\s\\pL\\pN]+'))
                 AS n_bpe_tokens,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
               md5(text) AS fingerprint
        FROM documents
    """,
    "quality_scores": """
        SELECT doc_id,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
                 / greatest(length(text), 1) AS punct_ratio,
               len(regexp_extract_all(text,
                 '(?i)\\b(?:the|a|an|and|or|of|to|in|is|that|it|for|on|with|as|was|at|by|be|this)\\b')) * 1.0
                 / greatest(len(regexp_extract_all(text, '[^\\s]+')), 1) AS stopword_ratio,
               length(text) * 1.0
                 / greatest(len(regexp_extract_all(text, '[^\\s]+')), 1) AS chars_per_token,
               len(regexp_extract_all(text, '\\b[A-Z]{2,}\\b')) * 1.0
                 / greatest(len(regexp_extract_all(text, '[^\\s]+')), 1) AS caps_token_ratio
        FROM documents
    """,
    # exact n-gram Jaccard, O(n^2) in SQL (fine at sf0.01): shingle lists
    # via list_transform over token positions, intersection via list_intersect.
    "ngram_jaccard_pairs": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS t FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
          FROM toks WHERE len(t) >= 3
        ), pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.s, b.s)) AS inter,
                 len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, inter, uni FROM pairs
        WHERE inter * 1.0 / uni >= 0.2
    """,
    "cosine_pairs_brute": """
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
    """,
    "knn_brute": """
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qe FROM embeddings
          WHERE vec_id < 4
        ), scored AS (
          SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(q.qe, e.embedding) AS score
          FROM q CROSS JOIN embeddings e
        ), ranked AS (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, vec_id) AS rank
          FROM scored
        )
        SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 10
    """,
}

KG = {
    "kg_sentences": f"SELECT conv_id, turn_idx, sent_idx, text, char_start FROM {GS}",
    "kg_turn_reassembly": f"""
        SELECT conv_id, turn_idx, text FROM {TR} WHERE length(text) > 0
    """,
    "kg_mentions": f"""
        SELECT conv_id, turn_idx, sent_idx, mention_idx, surface, norm, cls,
               start, "end" FROM {GM}
    """,
    "kg_triples": f"""
        SELECT DISTINCT a.norm AS subj, 'co_occurs_with' AS pred, b.norm AS obj,
               a.conv_id, a.turn_idx, a.sent_idx
        FROM {GM} a JOIN {GM} b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
         AND a.sent_idx = b.sent_idx
        WHERE a.norm <> b.norm
    """,
    "kg_fuzzy_alias_pairs": f"""
        WITH names AS (SELECT DISTINCT norm FROM {GM})
        SELECT a.norm AS a, b.norm AS b,
               CAST(levenshtein(a.norm, b.norm) AS BIGINT) AS dist
        FROM names a JOIN names b ON a.norm < b.norm
        WHERE levenshtein(a.norm, b.norm) <= 1
        ORDER BY a, b
    """,
    "conv_entity_sequence": f"""
        WITH firsts AS (
          SELECT conv_id, norm,
                 min(turn_idx*1000000 + sent_idx*1000 + mention_idx) AS pos
          FROM {GM} GROUP BY conv_id, norm)
        SELECT conv_id,
               string_agg(norm, ',' ORDER BY pos, norm) AS entity_seq,
               CAST(count(*) AS BIGINT) AS n_entities
        FROM firsts GROUP BY conv_id ORDER BY conv_id
    """,
    "kg_fuzzy_nel": f"""
        WITH names AS (SELECT DISTINCT norm FROM {GM}),
        unlinked AS (SELECT norm FROM names
                     WHERE norm NOT IN (SELECT term FROM {AL}))
        SELECT u.norm, a.term, min(a.id) AS id
        FROM unlinked u JOIN {AL} a ON levenshtein(u.norm, a.term) = 1
        GROUP BY u.norm, a.term ORDER BY u.norm, a.term
    """,
    "kg_fuzzy_alias_clusters": f"""
        WITH RECURSIVE names AS (SELECT DISTINCT norm FROM {GM}),
        pairs AS (
          SELECT a.norm AS a, b.norm AS b
          FROM names a JOIN names b ON a.norm < b.norm
          WHERE levenshtein(a.norm, b.norm) <= 1),
        edges AS (SELECT a AS src, b AS dst FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS name, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src ORDER BY src
    """,
    "kg_window_triples": f"""
        WITH tn AS (SELECT DISTINCT conv_id, turn_idx, norm FROM {GM})
        SELECT DISTINCT a.norm AS subj, 'co_occurs_in_window' AS pred,
               b.norm AS obj, a.conv_id, a.turn_idx,
               CAST(-1 AS INTEGER) AS sent_idx
        FROM tn a JOIN tn b
          ON a.conv_id = b.conv_id
         AND b.turn_idx BETWEEN a.turn_idx AND a.turn_idx + 2
        WHERE a.norm <> b.norm
    """,
    "kg_nodes": f"""
        SELECT substr(md5(cls || '|' || norm), 1, 16) AS node_id, norm, cls,
               count(*) AS n_mentions
        FROM {GM} GROUP BY norm, cls
    """,
    "kg_edges": f"""
        WITH triples AS (
          SELECT DISTINCT a.norm AS subj, b.norm AS obj,
                 a.conv_id, a.turn_idx, a.sent_idx
          FROM {GM} a JOIN {GM} b
            ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
           AND a.sent_idx = b.sent_idx
          WHERE a.norm <> b.norm
        ), clsmap AS (
          -- endpoint ids hash (cls, norm) exactly as nodes do; min(cls)
          -- mirrors the engine's lexicographic conflict rule
          SELECT norm, min(cls) AS cls FROM {GM} GROUP BY norm
        )
        SELECT substr(md5(cs.cls || '|' || subj), 1, 16) AS subj_id, subj,
               'co_occurs_with' AS pred,
               substr(md5(co.cls || '|' || obj), 1, 16) AS obj_id, obj,
               count(*) AS weight
        FROM triples t
        JOIN clsmap cs ON t.subj = cs.norm
        JOIN clsmap co ON t.obj = co.norm
        GROUP BY subj, obj, cs.cls, co.cls
    """,
    "kg_entity_freq": f"""
        SELECT norm AS entity, count(*) AS total_count,
               count(DISTINCT conv_id) AS convs_spanned,
               count(*) * 1.0 / count(DISTINCT conv_id) AS freq_per_conv
        FROM {GM} GROUP BY norm
    """,
    "kg_top_entities": f"""
        SELECT norm AS entity, count(*) AS total_count,
               count(DISTINCT conv_id) AS convs_spanned,
               count(*) * 1.0 / count(DISTINCT conv_id) AS freq_per_conv
        FROM {GM} GROUP BY norm
        ORDER BY total_count DESC, entity LIMIT 25
    """,
    "kg_linked_mentions": f"""
        SELECT m.conv_id, m.turn_idx, m.sent_idx, m.mention_idx, m.surface,
               m.norm, m.cls, m.start, m."end",
               coalesce(a.id, '') AS entity_id
        FROM {GM} m LEFT JOIN {AL} a ON m.norm = a.term
    """,
    "kg_doc_spans": f"""
        SELECT m.conv_id, m.turn_idx, m.sent_idx, m.mention_idx, m.surface,
               m.norm, m.cls,
               CAST(m.start + s.char_start AS INTEGER) AS doc_start,
               CAST(m."end" + s.char_start AS INTEGER) AS doc_end
        FROM {GM} m JOIN {GS} s
          ON m.conv_id = s.conv_id AND m.turn_idx = s.turn_idx
         AND m.sent_idx = s.sent_idx
    """,
    "kg_entity_freq_per_conv": f"""
        SELECT conv_id, norm AS entity, count(*) AS n
        FROM {GM} GROUP BY conv_id, norm
    """,
    "kg_search": f"""
        SELECT conv_id, turn_idx, sent_idx, count(*) AS n_watch_mentions
        FROM {GM}
        WHERE norm IN ('zetamycin', 'actozine', 'arvel syndrome')
        GROUP BY conv_id, turn_idx, sent_idx
    """,
}


def all_oracles() -> dict[str, str]:
    return {**RELATIONAL, **KG}

RELATIONAL["events_hourly"] = """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type, date_trunc('hour', ts)
"""

RELATIONAL["events_sessions"] = """
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN prev_ts IS NULL
                    OR date_diff('second', prev_ts, ts) > 1800
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM ordered GROUP BY user_id
"""

RELATIONAL["events_hopping"] = """
    WITH e AS (
      SELECT event_type, value, epoch_us(ts) // 1000000 AS sec FROM events
    ), w AS (
      SELECT event_type, value,
             (sec // 900) * 900 - i * 900 AS wstart_sec
      FROM e CROSS JOIN (SELECT unnest(range(4)) AS i)
    )
    SELECT event_type, wstart_sec, count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM w GROUP BY event_type, wstart_sec
"""

RELATIONAL["events_attribution"] = """
    WITH p AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, max(event_id) AS event_id_r FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.ts, p.event_id, p.value,
           c.ts AS ts_r, c.event_id_r
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

KG["kg_merged_mentions"] = KG["kg_mentions"]

# Derived-gold oracles (sources.gold_derived): engine-independent
# straight-line recomputations of the deterministic post-NER operators.
GRM = f"read_parquet('{SYNTH}/gold_resolved_mentions.parquet')"
GDA = f"read_parquet('{SYNTH}/gold_disambiguated.parquet')"
GFP = f"read_parquet('{SYNTH}/gold_doc_rollfp.parquet')"
GSH = f"read_parquet('{SYNTH}/gold_simhash_pairs.parquet')"

GMH = f"read_parquet('{SYNTH}/gold_minhash_pairs.parquet')"
GCL = f"read_parquet('{SYNTH}/gold_cosine_lsh_pairs.parquet')"

RELATIONAL["minhash_lsh_pairs"] = f"SELECT doc_a, doc_b, est_jaccard FROM {GMH}"
GDS = f"read_parquet('{SYNTH}/gold_dup_span.parquet')"
RELATIONAL["docs_dup_span_removal"] = \
    f"SELECT doc_id, text_clean, n_removed FROM {GDS}"
GMI = f"read_parquet('{SYNTH}/gold_minhash_incremental.parquet')"
RELATIONAL["minhash_incremental"] = \
    f"SELECT doc_new, doc_old, est_jaccard FROM {GMI}"
RELATIONAL["cosine_lsh_pairs"] = f"SELECT vec_id_a, vec_id_b FROM {GCL}"

GLI = f"read_parquet('{SYNTH}/gold_langid.parquet')"
GKI = f"read_parquet('{SYNTH}/gold_knn_ivf.parquet')"

RELATIONAL["lang_id"] = f"SELECT doc_id, lang_pred, lang_score FROM {GLI}"

GRP = f"read_parquet('{SYNTH}/gold_repetition.parquet')"
RELATIONAL["docs_repetition"] = (
    "SELECT doc_id, dup_line_frac, dup_line_char_frac, top_2gram_char_frac,"
    f" top_3gram_char_frac, dup_5gram_char_frac FROM {GRP}")
RELATIONAL["knn_ivf"] = f"SELECT query_id, rank, vec_id FROM {GKI}"
GKS = f"read_parquet('{SYNTH}/gold_knn_self.parquet')"
RELATIONAL["knn_self"] = f"SELECT vec_id, rank, neighbor_id FROM {GKS}"

# HLL approx-distinct: deterministic (splitmix64 + fixed estimator), so the
# oracle is the straight-line single-process recompute in gold_derived.
GAD = f"read_parquet('{SYNTH}/gold_approx_distinct.parquet')"
RELATIONAL["approx_distinct_users"] = (
    f"SELECT event_type, approx_distinct FROM {GAD}"
)

# The P/R gate artifact is a pure function of (engine triples, gold
# triples); since kg_triples is itself oracled to EQUAL the gold set, the
# correct metric row is exactly (tp = |distinct gold triples|, fp = fn = 0,
# P = R = F1 = 1.0) — any engine/gold divergence breaks tp or the ratios.
KG["kg_triple_prf"] = f"""
    WITH t AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm
    )
    SELECT count(*) AS tp, CAST(0 AS BIGINT) AS fp, CAST(0 AS BIGINT) AS fn,
           CAST(1.0 AS DOUBLE) AS "precision", CAST(1.0 AS DOUBLE) AS recall,
           CAST(1.0 AS DOUBLE) AS f1
    FROM t
"""

KG["kg_resolved_mentions"] = f"""
    SELECT conv_id, turn_idx, sent_idx, mention_idx, surface, norm, cls,
           start, "end" FROM {GRM}
"""
KG["kg_disambiguated"] = f"""
    SELECT conv_id, turn_idx, sent_idx, mention_idx, norm, entity_id FROM {GDA}
"""
RELATIONAL["rolling_fingerprints"] = f"SELECT doc_id, roll_fp FROM {GFP}"
RELATIONAL["simhash_pairs"] = f"SELECT doc_a, doc_b, hamming FROM {GSH}"

KG["kg_entity_freq_batches"] = f"""
    SELECT norm AS entity, count(*) AS total_count,
           count(DISTINCT conv_id) AS convs_spanned,
           count(DISTINCT CAST(substr(conv_id, 6) AS INTEGER) % 8) AS batches_spanned,
           count(*) * 1.0 / count(DISTINCT conv_id) AS freq_per_conv,
           count(*) * 1.0
             / count(DISTINCT CAST(substr(conv_id, 6) AS INTEGER) % 8) AS freq_per_batch,
           string_agg(DISTINCT conv_id, ',' ORDER BY conv_id) AS articles_set
    FROM {GM} GROUP BY norm
"""

# write->load round trip must reproduce the doc-span mentions exactly
KG["kg_pubtator_roundtrip"] = f"""
    SELECT m.conv_id, m.turn_idx,
           CAST(m.start + s.char_start AS INTEGER) AS doc_start,
           CAST(m."end" + s.char_start AS INTEGER) AS doc_end,
           m.surface, m.cls, m.norm
    FROM {GM} m JOIN {GS} s
      ON m.conv_id = s.conv_id AND m.turn_idx = s.turn_idx
     AND m.sent_idx = s.sent_idx
"""

# transitive closure over the SAME exact-jaccard pair set (recursive CTE);
# group id = smallest doc id reachable through any chain of pairs
RELATIONAL["near_dup_groups"] = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ), cc(doc_id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.doc_id
    )
    SELECT doc_id, min(label) AS group_id FROM cc GROUP BY doc_id
"""

RELATIONAL["revenue_by_priority"] = """
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
"""

RELATIONAL["events_top_value_per_type"] = """
    SELECT event_type, event_id, value, rn FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 5
"""

# same multiplicative-hash arithmetic as ops.relational.hash_sample;
# 214748364 = int(0.05 * 2^32)
RELATIONAL["orders_hash_sample"] = """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE (o_orderkey * 2654435761) % 4294967296 < 214748364
"""

RELATIONAL["customers_without_orders"] = """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
"""

# intervals derived from nation exactly as queries._promo_intervals
RELATIONAL["events_in_promo_windows"] = """
    WITH iv AS (
      SELECT CAST(n_nationkey AS BIGINT) AS interval_id,
             TIMESTAMP '2024-01-02' + (n_nationkey % 9) * INTERVAL 3 DAY
               + n_nationkey * INTERVAL 1 HOUR AS t_start,
             TIMESTAMP '2024-01-02' + (n_nationkey % 9) * INTERVAL 3 DAY
               + n_nationkey * INTERVAL 1 HOUR + INTERVAL 36 HOUR AS t_end
      FROM nation)
    SELECT e.event_id, iv.interval_id
    FROM events e JOIN iv ON e.ts BETWEEN iv.t_start AND iv.t_end
"""

RELATIONAL["events_value_quantiles"] = """
    SELECT quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99
    FROM events
"""

RELATIONAL["events_value_quantiles_cont"] = """
    SELECT round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
"""

RELATIONAL["docs_tfidf"] = """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df),
                 4) AS tfidf
    FROM tf JOIN df USING (term) WHERE df.df >= 2
"""

GCMS = f"read_parquet('{SYNTH}/gold_cms_counts.parquet')"
RELATIONAL["cms_user_counts"] = f"SELECT user_id, est_count FROM {GCMS}"

# k-means + media features: deterministic by spec (seeded init, per-
# iteration centroid rounding / stdlib decode + fixed pooling), so the
# oracle is the straight-line recompute in gold_derived.
GKM = f"read_parquet('{SYNTH}/gold_kmeans_assign.parquet')"
RELATIONAL["embeddings_kmeans"] = f"SELECT vec_id, cluster FROM {GKM}"

GBP = f"read_parquet('{SYNTH}/gold_bpe_merges.parquet')"
GBA = f"read_parquet('{SYNTH}/gold_bpe_pieces.parquet')"
RELATIONAL["docs_bpe_tokenize"] = f"SELECT doc_id, n_pieces, n_words FROM {GBA}"
RELATIONAL["docs_bpe_merges"] = f'SELECT "rank", "left", "right", pair_count FROM {GBP}'

GSD = f"read_parquet('{SYNTH}/gold_semdedup.parquet')"
RELATIONAL["embeddings_semdedup"] = f"SELECT vec_id, cluster, rep_id FROM {GSD}"

GOF = f"read_parquet('{SYNTH}/gold_outlier_filter.parquet')"
RELATIONAL["embeddings_outlier_filter"] = f"SELECT vec_id, cluster, dist FROM {GOF}"

GMF = f"read_parquet('{SYNTH}/gold_media_features.parquet')"
RELATIONAL["media_features"] = (
    f"SELECT item_id, kind, feat_mean, feat_l2 FROM {GMF}"
)

RELATIONAL["events_quantiles_by_type"] = """
    SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
           quantile_disc(value, 0.5) AS value
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.9 AS DOUBLE) AS q,
           quantile_disc(value, 0.9) AS value
    FROM events GROUP BY event_type
"""

RELATIONAL["events_quantiles_by_type_cont"] = """
    SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
           round(quantile_cont(value, 0.5), 4) AS value
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, CAST(0.9 AS DOUBLE) AS q,
           round(quantile_cont(value, 0.9), 4) AS value
    FROM events GROUP BY event_type
"""

RELATIONAL["orders_bloom_semi"] = """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = o_custkey AND c_acctbal < 0)
"""

# parallel unnests of equal-length lists align positionally in DuckDB
RELATIONAL["embedding_label_centroids"] = """
    WITH e AS (
      SELECT label, unnest(embedding) AS v,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings)
    SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
           round(avg(v), 4) AS centroid
    FROM e GROUP BY label, i
"""

RELATIONAL["events_props_extract"] = """
    SELECT event_id,
           -- NULLIF: DuckDB regexp_extract yields '' on no-match (and
           -- CAST('') errors); the engine yields NULL — NULLIF makes
           -- both sides define the no-match case identically as NULL
           CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '')
                AS BIGINT) AS k,
           regexp_replace(props, '\\d+', '<NUM>', 'g') AS props_redacted
    FROM events
"""

RELATIONAL["latest_event_per_user"] = """
    SELECT user_id, event_id, ts, rn FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id) AS rn
      FROM events) WHERE rn = 1
"""

RELATIONAL["top_users_by_value_per_type"] = """
    SELECT event_type, user_id, total_value, rn FROM (
      SELECT event_type, user_id,
             round(sum(value), 4) AS total_value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY round(sum(value), 4) DESC, user_id) AS rn
      FROM events GROUP BY event_type, user_id) WHERE rn <= 3
"""

RELATIONAL["embedding_dup_groups"] = """
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    ), edges AS (
      SELECT va AS src, vb AS dst FROM pairs
      UNION ALL
      SELECT vb, va FROM pairs
    ), cc(vec_id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.vec_id
    )
    SELECT vec_id, min(label) AS group_id FROM cc GROUP BY vec_id
"""

RELATIONAL["docs_curated_v2"] = """
    WITH sig AS (
      SELECT doc_id, text,
        len(regexp_extract_all(text, '[^\\s]+')) AS n_words,
        length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
        len(regexp_extract_all(text, '[#…]')) AS symbols,
        len(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(x, '[^ \\t]'))) AS n_lines,
        len(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(x, '^[ \\t]*[-*•]'))) AS bullets,
        len(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(x, '(\\.\\.\\.|…)[ \\t]*$'))) AS ellipsis,
        len(regexp_extract_all(text, '[^\\s]*[A-Za-z][^\\s]*')) AS alpha
      FROM documents),
    g AS (
      SELECT doc_id, text FROM sig
      WHERE n_words BETWEEN 25 AND 100000
        AND (CASE WHEN n_words > 0 THEN nonws * 1.0 / n_words
                  ELSE 0.0 END) BETWEEN 3.0 AND 10.0
        AND (CASE WHEN n_words > 0 THEN symbols * 1.0 / n_words
                  ELSE 0.0 END) <= 0.1
        AND (CASE WHEN n_lines > 0 THEN bullets * 1.0 / n_lines
                  ELSE 0.0 END) <= 0.9
        AND (CASE WHEN n_lines > 0 THEN ellipsis * 1.0 / n_lines
                  ELSE 0.0 END) <= 0.3
        AND (CASE WHEN n_words > 0 THEN alpha * 1.0 / n_words
                  ELSE 0.0 END) >= 0.8),
    ln AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM g),
    ex AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS idx,
                  unnest(l) AS line FROM ln),
    cnt AS (SELECT line, count(*) AS c FROM ex
            WHERE regexp_matches(line, '[^ \\t]') GROUP BY line),
    kept AS (
      SELECT e.doc_id,
             string_agg(e.line, chr(10) ORDER BY e.idx) AS text
      FROM ex e LEFT JOIN cnt c ON e.line = c.line
      WHERE c.c IS NULL OR c.c < 2 GROUP BY e.doc_id),
    tf AS (SELECT doc_id, text FROM kept
           WHERE len(regexp_extract_all(text, '[^\\s]+')) >= 5),
    red AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
          '<EMAIL>', 'g'),
          '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
          '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
          '\\+?\\d[\\d\\-\\(\\) ]{7,}\\d', '<PHONE>', 'g') AS text
      FROM tf)
    SELECT doc_id, text FROM red
    WHERE (doc_id * 2654435761) % 4294967296 <
          CAST(0.5 * 4294967296 AS BIGINT)
"""

RELATIONAL["docs_pii_redact"] = """
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
        '<EMAIL>', 'g'),
        '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
        '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
        '\\+?\\d[\\d\\-\\(\\) ]{7,}\\d', '<PHONE>', 'g') AS text_redacted
    FROM documents
"""

RELATIONAL["docs_dup_line_removal"] = """
    WITH ln AS (SELECT doc_id, string_split(text, chr(10)) AS l
                FROM documents),
    ex AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS idx,
                  unnest(l) AS line FROM ln),
    cnt AS (SELECT line, count(*) AS c FROM ex
            WHERE regexp_matches(line, '[^ \\t]') GROUP BY line),
    kept AS (
      SELECT e.doc_id,
             string_agg(e.line, chr(10) ORDER BY e.idx) AS text_clean,
             count(*) AS n_kept
      FROM ex e LEFT JOIN cnt c ON e.line = c.line
      WHERE c.c IS NULL OR c.c < 2
      GROUP BY e.doc_id)
    SELECT ln.doc_id,
           COALESCE(k.text_clean, '') AS text_clean,
           CAST(len(ln.l) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
    FROM ln LEFT JOIN kept k ON ln.doc_id = k.doc_id
"""

RELATIONAL["docs_gopher_signals"] = """
    WITH c AS (
      SELECT doc_id,
        len(regexp_extract_all(text, '[^\\s]+')) AS n_words,
        length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
        len(regexp_extract_all(text, '[#…]')) AS symbols,
        len(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(x, '[^ \\t]'))) AS n_lines,
        len(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(x, '^[ \\t]*[-*•]'))) AS bullets,
        len(list_filter(string_split(text, chr(10)),
            x -> regexp_matches(x, '(\\.\\.\\.|…)[ \\t]*$'))) AS ellipsis,
        len(regexp_extract_all(text, '[^\\s]*[A-Za-z][^\\s]*')) AS alpha,
        (CASE WHEN regexp_matches(text, '\\bthe\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\bbe\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\bto\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\bof\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\band\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\bthat\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\bhave\\b') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, '\\bwith\\b') THEN 1 ELSE 0 END)
          AS n_stop_hits
      FROM documents)
    SELECT doc_id, n_words,
      CASE WHEN n_words > 0 THEN nonws * 1.0 / n_words ELSE 0.0 END
        AS mean_word_len,
      CASE WHEN n_words > 0 THEN symbols * 1.0 / n_words ELSE 0.0 END
        AS symbol_word_ratio,
      CASE WHEN n_lines > 0 THEN bullets * 1.0 / n_lines ELSE 0.0 END
        AS bullet_line_frac,
      CASE WHEN n_lines > 0 THEN ellipsis * 1.0 / n_lines ELSE 0.0 END
        AS ellipsis_line_frac,
      CASE WHEN n_words > 0 THEN alpha * 1.0 / n_words ELSE 0.0 END
        AS alpha_word_frac,
      CAST(n_stop_hits AS BIGINT) AS n_stop_hits
    FROM c
"""

RELATIONAL["docs_near_dup_keep_best"] = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ), cc(doc_id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.doc_id
    ), labels AS (
      SELECT doc_id, min(label) AS group_id FROM cc GROUP BY doc_id
    ), scored AS (
      SELECT COALESCE(l.group_id, d.doc_id) AS group_id, d.doc_id,
             (d.doc_id * 2654435761) % 4294967296 AS score
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    )
    SELECT group_id, doc_id, score FROM (
      SELECT *, row_number() OVER (PARTITION BY group_id
                                   ORDER BY score DESC, doc_id) AS rn
      FROM scored) WHERE rn = 1
"""

RELATIONAL["users_retention_cohorts"] = """
    WITH a AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week
      FROM events),
    c AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id)
    SELECT c.cohort_week, a.week, count(*) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY c.cohort_week, a.week
"""

RELATIONAL["events_running_totals"] = """
    SELECT user_id, event_id, value,
           row_number() OVER w AS rn,
           coalesce(lag(value) OVER w, -1.0) AS prev_value,
           coalesce(lead(value) OVER w, -1.0) AS next_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# BM25 (k1=1.5, b=0.75, Lucene idf). Operand order mirrors
# ops.textstats.bm25_scores exactly so values are bit-stable pre-round.
RELATIONAL["docs_bm25"] = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), d AS (
      SELECT doc_id, len(t) AS dl,
             len(list_filter(t, x -> x = 'hash')) AS tf0,
             len(list_filter(t, x -> x = 'join')) AS tf1,
             len(list_filter(t, x -> x = 'window')) AS tf2
      FROM toks
    ), s AS (
      SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
             sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      FROM d
    )
    SELECT doc_id, round(
        ln(((n - df0 + 0.5) / (df0 + 0.5)) + 1.0)
          * ((tf0 * 2.5) / (tf0 + 1.5 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)))
      + ln(((n - df1 + 0.5) / (df1 + 0.5)) + 1.0)
          * ((tf1 * 2.5) / (tf1 + 1.5 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)))
      + ln(((n - df2 + 0.5) / (df2 + 0.5)) + 1.0)
          * ((tf2 * 2.5) / (tf2 + 1.5 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))),
      4) AS bm25
    FROM d, s
    WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
"""

RELATIONAL["events_user_type_pivot"] = """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
    FROM events GROUP BY user_id
"""

RELATIONAL["docs_quality_filtered"] = """
    WITH s AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
               '(?i)\\b(?:the|a|an|and|or|of|to|in|is|that|it|for|on|with|as|was|at|by|be|this)\\b')) * 1.0
               / greatest(len(regexp_extract_all(text, '[^\\s]+')), 1)
               AS stopword_ratio
      FROM documents
    ), t AS (SELECT quantile_disc(stopword_ratio, 0.25) AS thr FROM s)
    SELECT doc_id FROM s, t WHERE stopword_ratio >= thr
"""

RELATIONAL["events_stratified_sample"] = """
    SELECT event_type, event_id, value, sample_rank FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                ORDER BY (event_id * 2654435761) % 4294967296, event_id)
               AS sample_rank
      FROM events) WHERE sample_rank <= 20
"""

RELATIONAL["events_value_ranks"] = """
    SELECT event_type, event_id, value,
           rank() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
           dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS drnk,
           ntile(4) OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS tile
    FROM events
"""

RELATIONAL["docs_chunks"] = """
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
               WHERE length(text) > 0),
    e AS (SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(greatest(ceil((n - 20) / 100.0), 1) AS BIGINT) - 1))
               AS chunk_idx
          FROM d)
    SELECT doc_id, chunk_idx,
           substr(text, 1 + CAST(chunk_idx AS INTEGER) * 100, 120) AS chunk
    FROM e
"""

# the full curation chain, step for step; 2147483648 = int(0.5 * 2^32)
RELATIONAL["docs_curated"] = """
    WITH kept AS (
      SELECT doc_id, text FROM documents
      WHERE len(regexp_extract_all(text, '[^\\s]+')) >= 5
    ), reps AS (
      SELECT min(doc_id) AS doc_id FROM kept GROUP BY text
    ), dedup AS (
      SELECT k.doc_id, k.text FROM kept k JOIN reps USING (doc_id)
    )
    SELECT doc_id, text FROM dedup
    WHERE (doc_id * 2654435761) % 4294967296 < 2147483648
"""

# incremental ingest is additive-exact (update(build(A), B) == build(A∪B)),
# so its oracle IS the full-corpus kg_edges SQL — the driver check
# certifies the fold-in path equals a from-scratch rebuild byte for byte
KG["kg_edges_incremental"] = KG["kg_edges"]

KG["kg_edge_neighborhood"] = """
    WITH triples AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm
    )
    SELECT subj, 'co_occurs_with' AS pred, obj,
           CAST(count(*) AS BIGINT) AS weight
    FROM triples
    WHERE subj >= 'a' AND subj <= 'ezzzzzzz'
    GROUP BY subj, obj ORDER BY subj, obj
""".replace("{GM}", GM)

# PageRank: deterministic by per-iteration rounding (spec in
# sources.gold_derived.write_pagerank_gold), so the oracle is the
# straight-line single-process recompute, like k-means/HLL.
GPR = f"read_parquet('{SYNTH}/gold_pagerank.parquet')"
GEC = f"read_parquet('{SYNTH}/gold_eigencentrality.parquet')"
KG["kg_eigencentrality"] = f"SELECT norm, score FROM {GEC}"
GPPR = f"read_parquet('{SYNTH}/gold_ppr.parquet')"
KG["kg_ppr"] = f"SELECT norm, rank FROM {GPPR}"
GCT = f"read_parquet('{SYNTH}/gold_contamination.parquet')"
RELATIONAL["docs_decontam"] = f"SELECT doc_id, n_hits FROM {GCT}"

RELATIONAL["user_order_event_profile"] = """
    WITH o AS (SELECT o_custkey AS uid, count(*) AS n_orders,
                      sum(o_totalprice) AS total_spend
               FROM orders GROUP BY 1),
         e AS (SELECT user_id AS uid, count(*) AS n_events,
                      sum(value) AS total_value
               FROM events GROUP BY 1)
    SELECT coalesce(o.uid, e.uid) AS uid,
           coalesce(n_orders, 0) AS n_orders,
           round(coalesce(total_spend, 0.0), 4) AS total_spend,
           coalesce(n_events, 0) AS n_events,
           round(coalesce(total_value, 0.0), 4) AS total_value
    FROM o FULL OUTER JOIN e ON o.uid = e.uid
"""

RELATIONAL["events_rollup"] = """
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(hod, -1) AS hod,
           n, round(sum_value, 4) AS sum_value
    FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                 count(value) AS n, sum(value) AS sum_value
          FROM events GROUP BY ROLLUP(event_type, hod))
"""

RELATIONAL["top_parts_heavy_hitters"] = """
    SELECT l_partkey, n, rnk FROM (
      SELECT l_partkey, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, l_partkey) AS rnk
      FROM lineitem GROUP BY l_partkey) WHERE rnk <= 20
"""

RELATIONAL["events_value_pctiles"] = """
    SELECT event_type, event_id, value,
           percent_rank() OVER (PARTITION BY event_type
                                ORDER BY value) AS prnk,
           cume_dist() OVER (PARTITION BY event_type
                             ORDER BY value) AS cdist
    FROM events
"""

RELATIONAL["orders_weighted_sample"] = """
    SELECT o_orderkey, o_orderpriority, o_totalprice, wkey, sample_rank
    FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice, wkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY wkey DESC, o_orderkey)
               AS sample_rank
      FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(floor(
                 ln((((o_orderkey * 2654435761) % 4294967296) + 0.5)
                    / 4294967296.0)
                 / o_totalprice * 1000000) AS BIGINT) AS wkey
        FROM orders))
    WHERE sample_rank <= 50
"""

RELATIONAL["docs_packed"] = """
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum,
           CAST(floor((cum - n_tokens) * 1.0 / 2048) AS BIGINT) AS pack_id
    FROM (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM (
        SELECT doc_id, source,
               len(regexp_extract_all(text, '[^\\s]+')) AS n_tokens
        FROM documents))
"""

RELATIONAL["docs_packed_sharded"] = """
    SELECT doc_id, source, bucket, n_tokens, CAST(cum AS BIGINT) AS cum,
           CAST(floor((cum - n_tokens) * 1.0 / 2048) AS BIGINT) AS pack_id
    FROM (
      SELECT doc_id, source, bucket, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source, bucket
                                 ORDER BY doc_id) AS cum
      FROM (
        SELECT doc_id, source,
               CAST(((doc_id * 2654435761) % 4294967296) % 8 AS BIGINT)
                 AS bucket,
               len(regexp_extract_all(text, '[^\\s]+')) AS n_tokens
        FROM documents))
"""

RELATIONAL["docs_vocab_top"] = """
    SELECT term, count(*) AS cnt FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents)
    GROUP BY term ORDER BY cnt DESC, term LIMIT 100
"""

RELATIONAL["docs_ppl_buckets"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM tok),
    lp AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             round(sum(tf * ln(cnt * 1.0 / tot.n)) / sum(tf), 4) AS logprob
      FROM tf JOIN tc USING (term) CROSS JOIN tot
      GROUP BY doc_id),
    th AS (SELECT quantile_disc(logprob, 1.0/3) AS t1,
                  quantile_disc(logprob, 2.0/3) AS t2 FROM lp)
    SELECT doc_id, n_tokens, logprob,
           CASE WHEN logprob >= t2 THEN 'head'
                WHEN logprob >= t1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM lp CROSS JOIN th
"""

RELATIONAL["docs_bigram_logprob"] = """
    WITH tok AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text),
                                 '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents),
    uni AS (SELECT unnest(t) AS w FROM tok),
    uc AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
    v AS (SELECT count(*) AS v FROM uc),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1])) AS b,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i])) AS w1
      FROM tok WHERE len(t) >= 2),
    tf AS (SELECT doc_id, b, w1, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
    bc AS (SELECT b, count(*) AS c12 FROM bg GROUP BY b)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
           round(sum(tf * (ln(c12 + 1.0) - ln(c1 + v.v))) / sum(tf), 4)
             AS logprob
    FROM tf JOIN bc USING (b) JOIN uc ON tf.w1 = uc.w CROSS JOIN v
    GROUP BY doc_id
"""

RELATIONAL["docs_unigram_logprob"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * ln(cnt * 1.0 / tot.n)) / sum(tf), 4) AS logprob
    FROM tf JOIN tc USING (term) CROSS JOIN tot
    GROUP BY doc_id
"""

RELATIONAL["users_funnel"] = """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v,
             min(CASE WHEN event_type = 'click' THEN ts END) AS c,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(CASE WHEN v < c AND c < p THEN 3
                     WHEN v < c THEN 2
                     WHEN v IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage
    FROM f
"""

RELATIONAL["events_cube"] = """
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(hod, -1) AS hod,
           n, round(sum_value, 4) AS sum_value
    FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                 count(value) AS n, sum(value) AS sum_value
          FROM events GROUP BY CUBE(event_type, hod))
"""

RELATIONAL["events_value_histogram"] = """
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(value) AS n,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
"""
KG["kg_pagerank"] = f"SELECT norm, rank FROM {GPR}"

KG["kg_edges_npmi"] = f"""
    WITH sn AS (SELECT DISTINCT conv_id, turn_idx, sent_idx, norm FROM {GM}),
    singles AS (SELECT norm, count(*) AS c FROM sn GROUP BY norm),
    pairs AS (
      SELECT a.norm AS norm_a, b.norm AS norm_b, count(*) AS c_ab
      FROM sn a JOIN sn b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx AND a.norm < b.norm
      GROUP BY a.norm, b.norm),
    tot AS (SELECT count(*) AS n FROM {GS})
    SELECT norm_a, norm_b, c_ab, sa.c AS c_a, sb.c AS c_b,
           CASE WHEN c_ab >= tot.n THEN 1.0
                ELSE round(ln(c_ab * 1.0 * tot.n / (sa.c * 1.0 * sb.c))
                           / ln(tot.n * 1.0 / c_ab), 4) END AS npmi
    FROM pairs
    JOIN singles sa ON pairs.norm_a = sa.norm
    JOIN singles sb ON pairs.norm_b = sb.norm
    CROSS JOIN tot
"""

RELATIONAL["docs_split_assign"] = """
    SELECT doc_id, source,
           CASE WHEN (doc_id * 2654435761) % 4294967296 < 3435973836
                  THEN 'train'
                WHEN (doc_id * 2654435761) % 4294967296 < 3865470565
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
"""

RELATIONAL["docs_rebalance_sources"] = """
    WITH cnt AS (SELECT source, count(source) AS n
                 FROM documents GROUP BY source),
         sh AS (SELECT source, n,
                       CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
                                   WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
                                   WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
                                   ELSE NULL END AS share
                FROM cnt),
         mm AS (SELECT min(n / share) AS m FROM sh WHERE share IS NOT NULL)
    SELECT d.doc_id, d.source
    FROM documents d JOIN sh USING (source) CROSS JOIN mm
    WHERE sh.share IS NOT NULL
      AND (d.doc_id * 2654435761) % 4294967296 <
          CAST(floor(sh.share * mm.m / sh.n * 4294967296) AS BIGINT)
"""

RELATIONAL["docs_oov"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS cnt FROM toks GROUP BY term
        ORDER BY cnt DESC, term LIMIT 20))
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov
    FROM toks LEFT JOIN vocab v ON toks.term = v.term
    GROUP BY doc_id
"""

RELATIONAL["docs_normalize"] = """
    SELECT doc_id, ntext AS text,
           CAST(length(ntext) AS BIGINT) AS n_chars,
           ntext <> orig AS changed
    FROM (SELECT doc_id, text AS orig,
                 trim(regexp_replace(nfc_normalize(text),
                      '[\\s\\x00-\\x1f\\x7f]+', ' ', 'g')) AS ntext
          FROM documents)
"""

RELATIONAL["docs_truncate"] = """
    SELECT doc_id, array_to_string(tl[1:50], ' ') AS text,
           CAST(len(tl) AS BIGINT) AS n_tokens,
           len(tl) > 50 AS truncated
    FROM (SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS tl
          FROM documents)
"""

RELATIONAL["docs_dsir"] = """
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           GROUP BY doc_id, term),
    cr AS (SELECT term, count(*) AS cr FROM toks GROUP BY term),
    ctt AS (SELECT term, count(*) AS ct FROM toks WHERE source = 'src0'
            GROUP BY term),
    vocab AS (
      SELECT cr.term, cr.cr, coalesce(ctt.ct, 0) AS ct
      FROM cr LEFT JOIN ctt USING (term)
      ORDER BY cr.cr + coalesce(ctt.ct, 0) DESC, cr.term LIMIT 256),
    tot AS (SELECT sum(ct) AS st, sum(cr) AS sr, count(*) AS v FROM vocab),
    delta AS (
      SELECT term,
             ln((ct + 1.0) / (st + v)) - ln((cr + 1.0) / (sr + v)) AS d
      FROM vocab, tot)
    SELECT tf.doc_id, round(sum(tf.tf * coalesce(d.d, 0.0)), 4)
             AS dsir_weight
    FROM tf LEFT JOIN delta d USING (term) GROUP BY tf.doc_id
"""

RELATIONAL["embedding_decontam"] = """
    WITH ev AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                WHERE vec_id % 10 = 0),
    mx AS (
      SELECT c.vec_id,
             max(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), ev.e))
               AS m
      FROM embeddings c CROSS JOIN ev WHERE c.vec_id % 10 <> 0
      GROUP BY c.vec_id)
    SELECT vec_id, round(m, 4) AS max_eval_cos FROM mx WHERE m < 0.5
"""

RELATIONAL["lineitem_profile"] = """
    SELECT 'l_discount' AS "column", count(*) AS n,
           count(*) - count(l_discount) AS n_null,
           CAST(count(DISTINCT l_discount) AS BIGINT) AS n_distinct,
           CAST(min(l_discount) AS DOUBLE) AS min_val,
           CAST(max(l_discount) AS DOUBLE) AS max_val,
           round(avg(l_discount), 4) AS avg_val FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           CAST(min(l_extendedprice) AS DOUBLE),
           CAST(max(l_extendedprice) AS DOUBLE),
           round(avg(l_extendedprice), 4) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
           count(DISTINCT l_quantity), CAST(min(l_quantity) AS DOUBLE),
           CAST(max(l_quantity) AS DOUBLE), round(avg(l_quantity), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', count(*), count(*) - count(l_tax),
           count(DISTINCT l_tax), CAST(min(l_tax) AS DOUBLE),
           CAST(max(l_tax) AS DOUBLE), round(avg(l_tax), 4) FROM lineitem
"""

RELATIONAL["events_zscore"] = """
    SELECT event_id, event_type, value,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4)
             AS z
    FROM events
"""

RELATIONAL["docs_c4_signals"] = """
    WITH l AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line
      FROM documents),
    agg AS (
      SELECT doc_id, count(*) AS n_lines,
             sum(CASE WHEN regexp_matches(
                   trim(line, ' ' || chr(9) || chr(13)), '[.!?"'']$')
                 THEN 1 ELSE 0 END) AS ep,
             sum(CASE WHEN len(regexp_extract_all(line, '[^\\s]+')) >= 5
                 THEN 1 ELSE 0 END) AS w5
      FROM l GROUP BY doc_id)
    SELECT d.doc_id, CAST(a.n_lines AS BIGINT) AS n_lines,
           a.ep * 1.0 / a.n_lines AS frac_lines_end_punct,
           a.w5 * 1.0 / a.n_lines AS frac_lines_min_words,
           contains(lower(d.text), 'lorem ipsum') AS has_lorem_ipsum,
           contains(d.text, '{') AS has_brace,
           contains(lower(d.text), 'javascript') AS has_javascript
    FROM documents d JOIN agg a USING (doc_id)
"""

RELATIONAL["docs_source_kl"] = """
    WITH toks AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    st AS (SELECT source, term, count(*) AS c FROM toks
           GROUP BY source, term),
    ts AS (SELECT source, sum(c) AS t_s FROM st GROUP BY source),
    ct AS (SELECT term, sum(c) AS ct FROM st GROUP BY term),
    tot AS (SELECT sum(c) AS t FROM st)
    SELECT st.source, CAST(ts.t_s AS BIGINT) AS n_tokens,
           round(sum((st.c * 1.0 / ts.t_s)
                     * ln((st.c * tot.t * 1.0) / (ts.t_s * ct.ct))), 4)
             AS kl
    FROM st JOIN ts USING (source) JOIN ct USING (term), tot
    GROUP BY st.source, ts.t_s
"""

RELATIONAL["events_winsorize"] = """
    WITH b AS (SELECT round(quantile_cont(value, 0.05), 4) AS lo,
                      round(quantile_cont(value, 0.95), 4) AS hi
               FROM events)
    SELECT event_id, value,
           CASE WHEN value < lo THEN lo
                WHEN value > hi THEN hi ELSE value END AS value_w
    FROM events, b
"""

RELATIONAL["docs_concat_blocks"] = """
    WITH d AS (
      SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS tl,
             CAST((doc_id * 2654435761) % 4294967296 % 16 AS BIGINT)
               AS bucket
      FROM documents WHERE doc_id >= 0),
    toks AS (
      SELECT bucket, doc_id, unnest(tl) AS tok,
             unnest(range(1, len(tl) + 1)) AS pos
      FROM d),
    seq AS (
      SELECT bucket, tok,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY doc_id, pos) AS rn
      FROM toks)
    SELECT bucket, CAST((rn - 1) // 128 AS BIGINT) AS block_id,
           count(*) AS n_tokens,
           string_agg(tok, ' ' ORDER BY rn) AS text
    FROM seq GROUP BY bucket, (rn - 1) // 128
"""

# --- conversation-granularity transcript operators (ops/conversations) ---

KG["conv_stats"] = f"""
    SELECT conv_id,
           count(*) AS n_turns,
           CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_user,
           CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_assistant,
           CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tool,
           CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tool_calls,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END)
                AS BIGINT) AS assistant_chars,
           CAST(sum(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END)
                AS DOUBLE)
             / NULLIF(sum(length(text)), 0) AS assistant_share,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
    FROM {TR} GROUP BY conv_id
"""

KG["conv_loss_masks"] = f"""
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
           CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT)
             AS n_tokens,
           CAST(sum(len(regexp_extract_all(text, '[^\\s]+')))
                  OVER (PARTITION BY conv_id ORDER BY turn_idx)
                - len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT)
             AS tok_start,
           CAST(sum(len(regexp_extract_all(text, '[^\\s]+')))
                  OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT)
             AS tok_end,
           CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS BIGINT)
             AS train
    FROM {TR} ORDER BY conv_id, turn_idx
"""

KG["conv_key_turns"] = f"""
    WITH ctt AS (
      SELECT DISTINCT conv_id, turn_idx,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
               AS term
      FROM {TR}),
    ctt2 AS (SELECT * FROM ctt WHERE term <> ''),
    df AS (SELECT term, CAST(count(DISTINCT conv_id) AS BIGINT) AS df
           FROM ctt2 GROUP BY term),
    nc AS (SELECT count(DISTINCT conv_id) AS n FROM {TR}),
    scored AS (
      SELECT c.conv_id, CAST(c.turn_idx AS BIGINT) AS turn_idx,
             round(sum(ln(nc.n * 1.0 / df.df)), 4) AS score
      FROM ctt2 c JOIN df USING (term) CROSS JOIN nc
      GROUP BY c.conv_id, c.turn_idx),
    r AS (SELECT *, row_number() OVER (PARTITION BY conv_id
                                       ORDER BY score DESC, turn_idx)
                      AS rn
          FROM scored)
    SELECT conv_id, turn_idx, score FROM r WHERE rn = 1 ORDER BY conv_id
"""

KG["conv_context_overflow"] = f"""
    WITH t AS (
      SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
             CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT)
               AS n_tokens
      FROM {TR}),
    s AS (
      SELECT conv_id, turn_idx, n_tokens,
             sum(n_tokens) OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx DESC) AS suffix
      FROM t)
    SELECT conv_id,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(CASE WHEN sum(n_tokens) > 4096 THEN 1 ELSE 0 END
                AS BIGINT) AS overflow,
           CAST(min(CASE WHEN suffix <= 4096 THEN turn_idx END)
                AS BIGINT) AS keep_from_turn
    FROM s GROUP BY conv_id ORDER BY conv_id
"""

KG["conv_tool_latency"] = f"""
    WITH led AS (
      SELECT conv_id, turn_idx, role, tool, ts,
             lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS next_ts
      FROM {TR}),
    p AS (
      SELECT tool,
             (epoch_us(next_ts) - epoch_us(ts)) // 1000000 AS dt
      FROM led
      WHERE role = 'tool' AND tool IS NOT NULL AND next_ts IS NOT NULL)
    SELECT tool, CAST(count(*) AS BIGINT) AS n,
           round(sum(dt) * 1.0 / count(*), 4) AS mean_latency_s,
           CAST(max(dt) AS BIGINT) AS max_latency_s
    FROM p GROUP BY tool ORDER BY tool
"""

KG["conv_reply_latency"] = f"""
    WITH lagged AS (
      SELECT conv_id, turn_idx, role, ts,
             lag(role) OVER w AS prev_role,
             lag(ts) OVER w AS prev_ts
      FROM {TR}
      WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
    p AS (
      SELECT prev_role, role,
             (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS dt
      FROM lagged WHERE prev_role IS NOT NULL)
    SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n,
           round(sum(dt) * 1.0 / count(*), 4) AS mean_latency_s,
           CAST(max(dt) AS BIGINT) AS max_latency_s
    FROM p GROUP BY 1, 2 ORDER BY prev_role, role
"""

KG["conv_tool_errors"] = f"""
    SELECT tool,
           CAST(count(*) AS BIGINT) AS n_outputs,
           CAST(sum(CASE WHEN regexp_matches(text,
                     '(?i)(error|exception|timeout|failed)')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           round(sum(CASE WHEN regexp_matches(text,
                     '(?i)(error|exception|timeout|failed)')
                    THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS error_rate
    FROM {TR}
    WHERE role = 'tool' AND tool IS NOT NULL
    GROUP BY tool ORDER BY tool
"""

KG["conv_packed_sft"] = f"""
    WITH c AS (
      SELECT conv_id,
             CAST(sum(len(regexp_extract_all(text, '[^\\s]+'))) AS BIGINT)
               AS n_tokens,
             CAST((CAST(substr(conv_id, 5) AS BIGINT) * 2654435761)
                  % 4294967296 % 8 AS BIGINT) AS bucket
      FROM {TR} GROUP BY conv_id),
    w AS (
      SELECT conv_id, bucket, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket
                                      ORDER BY conv_id) AS BIGINT) AS cum
      FROM c)
    SELECT conv_id, bucket, n_tokens, cum,
           CAST(floor((cum - n_tokens) * 1.0 / 2048) AS BIGINT) AS pack_id
    FROM w ORDER BY bucket, conv_id
"""

KG["conv_fingerprints"] = f"""
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
           md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS text_md5
    FROM {TR} GROUP BY conv_id
"""

KG["conv_refusal_scan"] = f"""
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_role_turns,
           CAST(sum(CASE WHEN position('pending' IN lower(text)) > 0
                      OR position('draft' IN lower(text)) > 0
                      OR position('sample' IN lower(text)) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           round(sum(CASE WHEN position('pending' IN lower(text)) > 0
                      OR position('draft' IN lower(text)) > 0
                      OR position('sample' IN lower(text)) > 0
                    THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS flagged_share
    FROM {TR} WHERE role = 'assistant' GROUP BY conv_id
"""

KG["conv_role_patterns"] = f"""
    SELECT pattern, count(*) AS n_convs, min(conv_id) AS conv_id
    FROM (SELECT conv_id, string_agg(role, ',' ORDER BY turn_idx) AS pattern
          FROM {TR} GROUP BY conv_id)
    GROUP BY pattern
"""

KG["conv_tool_report"] = f"""
    SELECT tool, count(DISTINCT conv_id) AS n_convs, count(*) AS n_calls,
           round(CAST(sum(length(text)) AS DOUBLE) / count(*), 4) AS avg_chars
    FROM {TR} WHERE tool IS NOT NULL GROUP BY tool
"""

KG["conv_reply_pairs"] = f"""
    SELECT conv_id, turn_idx, text AS prompt, ntext AS response,
           length(text) AS prompt_chars, length(ntext) AS response_chars
    FROM (SELECT conv_id, turn_idx, role, text,
                 lead(role) OVER w AS nrole, lead(text) OVER w AS ntext
          FROM {TR}
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
    WHERE role = 'user' AND nrole = 'assistant'
"""

KG["conv_last_turns"] = f"""
    SELECT conv_id, turn_idx, role, text
    FROM (SELECT conv_id, turn_idx, role, text,
                 max(turn_idx) OVER (PARTITION BY conv_id) AS mx
          FROM {TR})
    WHERE turn_idx > mx - 3
"""

KG["conv_turn_gaps"] = f"""
    SELECT conv_id, count(gap_s) AS n_gaps, avg(gap_s) AS avg_gap_s,
           max(gap_s) AS max_gap_s
    FROM (SELECT conv_id,
                 (epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000
                   AS gap_s
          FROM {TR})
    GROUP BY conv_id
"""

KG["conv_schema_valid"] = f"""
    SELECT conv_id, turn_idx, role, text FROM {TR}
    WHERE conv_id IN (
      SELECT conv_id FROM {TR}
      GROUP BY conv_id
      HAVING bool_and(role = CASE turn_idx % 3
                               WHEN 0 THEN 'user'
                               WHEN 1 THEN 'assistant'
                               ELSE 'tool' END))
"""

KG["conv_sft_pairs"] = f"""
    WITH valid AS (
      SELECT conv_id, turn_idx, role, text FROM {TR}
      WHERE conv_id IN (
        SELECT conv_id FROM {TR}
        GROUP BY conv_id
        HAVING bool_and(role = CASE turn_idx % 3
                                 WHEN 0 THEN 'user'
                                 WHEN 1 THEN 'assistant'
                                 ELSE 'tool' END))),
    led AS (
      SELECT conv_id, turn_idx, role, text,
             lead(role) OVER w AS nrole, lead(text) OVER w AS ntext
      FROM valid WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
    pairs AS (
      SELECT conv_id, turn_idx, text AS prompt, ntext AS response,
             length(text) AS prompt_chars, length(ntext) AS response_chars
      FROM led WHERE role = 'user' AND nrole = 'assistant'),
    q AS (
      SELECT * FROM pairs
      WHERE prompt_chars >= 40 AND response_chars >= 40)
    SELECT min(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 8, '0'))
             AS pair_id,
           prompt, response,
           min(prompt_chars) AS prompt_chars,
           min(response_chars) AS response_chars,
           count(*) AS n_copies
    FROM q GROUP BY prompt, response
"""

KG["conv_context_windows"] = f"""
    SELECT conv_id, turn_idx,
           concat_ws(chr(10), l3, l2, l1) AS context, text AS target
    FROM (SELECT conv_id, turn_idx, role, text,
                 lag(text, 3) OVER w AS l3,
                 lag(text, 2) OVER w AS l2,
                 lag(text, 1) OVER w AS l1
          FROM {TR}
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
    WHERE role = 'assistant'
"""

# pattern-predicate triples: adjacent mention pairs; the 1-3 lowercased
# gap tokens between the spans form the predicate, else co_occurs_with
KG["kg_pattern_triples"] = f"""
    WITH pairs AS (
      SELECT a.conv_id, a.turn_idx, a.sent_idx,
             a.norm AS subj, b.norm AS obj, a."end" AS ae,
             greatest(b.start, a."end") AS bs
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx AND b.mention_idx = a.mention_idx + 1
      WHERE a.norm <> b.norm),
    g AS (
      SELECT p.conv_id, p.turn_idx, p.sent_idx, p.subj, p.obj,
             lower(substr(s.text, p.ae + 1, p.bs - p.ae)) AS gap
      FROM pairs p JOIN {GS} s
        ON p.conv_id = s.conv_id AND p.turn_idx = s.turn_idx
       AND p.sent_idx = s.sent_idx),
    t AS (
      SELECT *, len(regexp_extract_all(gap, '[a-z]+')) AS ntok,
             regexp_replace(
               regexp_replace(gap, '^[^a-z]+|[^a-z]+$', '', 'g'),
               '[^a-z]+', '_', 'g') AS predc
      FROM g)
    SELECT subj,
           CASE WHEN ntok BETWEEN 1 AND 3 THEN predc
                ELSE 'co_occurs_with' END AS pred,
           obj, conv_id, turn_idx, sent_idx
    FROM t
"""

KG["kg_typed_edges"] = f"""
    WITH pairs AS (
      SELECT a.conv_id, a.turn_idx, a.sent_idx,
             a.norm AS subj, b.norm AS obj, a."end" AS ae,
             greatest(b.start, a."end") AS bs
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx AND b.mention_idx = a.mention_idx + 1
      WHERE a.norm <> b.norm),
    g AS (
      SELECT p.subj, p.obj,
             lower(substr(s.text, p.ae + 1, p.bs - p.ae)) AS gap
      FROM pairs p JOIN {GS} s
        ON p.conv_id = s.conv_id AND p.turn_idx = s.turn_idx
       AND p.sent_idx = s.sent_idx),
    t AS (
      SELECT subj, obj, len(regexp_extract_all(gap, '[a-z]+')) AS ntok,
             regexp_replace(
               regexp_replace(gap, '^[^a-z]+|[^a-z]+$', '', 'g'),
               '[^a-z]+', '_', 'g') AS predc
      FROM g)
    SELECT subj,
           CASE WHEN ntok BETWEEN 1 AND 3 THEN predc
                ELSE 'co_occurs_with' END AS pred,
           obj, CAST(count(*) AS BIGINT) AS weight
    FROM t GROUP BY 1, 2, 3
"""

# ---- graph analytics over the materialized KG (ops/graph_analytics.py).
# All five recompute the graph kernels relationally over the same
# distinct sentence-level pair CTE the kg_edges oracle uses (recursive
# CTE for components).

KG["kg_degree_stats"] = f"""
    WITH triples AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    edges AS (SELECT subj, obj, count(*) AS weight
              FROM triples GROUP BY subj, obj)
    -- DuckDB sum(BIGINT) widens to HUGEINT -> pandas float64; cast back
    SELECT subj AS norm, count(*) AS degree,
           CAST(sum(weight) AS BIGINT) AS strength,
           max(weight) AS max_edge_weight
    FROM edges GROUP BY subj
"""

KG["kg_two_hop"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    reach AS (
      SELECT p1.s AS a, p2.o AS c FROM p p1 JOIN p p2 ON p1.o = p2.s
      WHERE p1.s <> p2.o
      UNION
      SELECT s, o FROM p)
    SELECT a AS norm, count(*) AS n_within_2 FROM reach GROUP BY a
"""

KG["kg_triangles"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    e AS (SELECT s AS lo, o AS hi FROM p WHERE s < o),
    t AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM e e1 JOIN e e2 ON e2.lo = e1.hi
      JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
    x AS (SELECT a AS norm FROM t UNION ALL SELECT b FROM t
          UNION ALL SELECT c FROM t)
    SELECT norm, count(*) AS n_triangles FROM x GROUP BY norm
"""

KG["kg_components"] = f"""
    WITH RECURSIVE p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    reach(node, comp) AS (
      SELECT s, s FROM p
      UNION
      SELECT p.o, r.comp FROM reach r JOIN p ON p.s = r.node)
    SELECT node AS norm, min(comp) AS component FROM reach GROUP BY node
"""

KG["kg_temporal_edges"] = f"""
    WITH triples AS (
      SELECT DISTINCT a.norm AS na, b.norm AS nb,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    j AS (
      SELECT p.na AS norm_a, p.nb AS norm_b, t.ts
      FROM triples p JOIN {TR} t
        ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
      WHERE p.na < p.nb)
    SELECT norm_a, norm_b, count(*) AS n_cooc,
           min(ts) AS first_seen, max(ts) AS last_seen,
           date_diff('microsecond', min(ts), max(ts)) / 1000000.0
             AS active_span_s
    FROM j GROUP BY norm_a, norm_b
"""

KG["kg_edges_decayed"] = f"""
    WITH triples AS (
      SELECT DISTINCT a.norm AS na, b.norm AS nb,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    ref AS (SELECT max(ts) AS t FROM {TR}),
    j AS (
      SELECT p.na AS norm_a, p.nb AS norm_b,
             (epoch_us((SELECT t FROM ref)) - epoch_us(t.ts))
               / 1000000.0 AS age_s
      FROM triples p JOIN {TR} t
        ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
      WHERE p.na < p.nb)
    SELECT norm_a, norm_b, CAST(count(*) AS BIGINT) AS n_cooc,
           round(sum(pow(2.0, -age_s / 604800.0)), 4) AS decayed_weight
    FROM j GROUP BY norm_a, norm_b
"""

KG["kg_clustering"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    e AS (SELECT s AS lo, o AS hi FROM p WHERE s < o),
    t AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM e e1 JOIN e e2 ON e2.lo = e1.hi
      JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
    x AS (SELECT a AS norm FROM t UNION ALL SELECT b FROM t
          UNION ALL SELECT c FROM t),
    tri AS (SELECT norm, count(*) AS n_tri FROM x GROUP BY norm),
    deg AS (SELECT s AS norm, count(*) AS d FROM p GROUP BY s)
    SELECT deg.norm, d AS degree,
           coalesce(n_tri, 0) AS n_triangles,
           CASE WHEN d < 2 THEN 0.0
                ELSE round(2.0 * coalesce(n_tri, 0) / (d * (d - 1)), 4)
           END AS clustering
    FROM deg LEFT JOIN tri ON tri.norm = deg.norm
"""

KG["kg_alias_candidates"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    w AS (
      SELECT p1.s AS a, p2.s AS b, count(*) AS n_shared
      FROM p p1 JOIN p p2 ON p1.o = p2.o AND p1.s < p2.s
      GROUP BY p1.s, p2.s),
    deg AS (SELECT s AS n, count(*) AS d FROM p GROUP BY s)
    SELECT a AS norm_a, b AS norm_b,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared * 1.0 / (da.d + db.d - n_shared), 4) AS jaccard
    FROM w JOIN deg da ON da.n = a JOIN deg db ON db.n = b
    WHERE n_shared >= 3
"""

KG["kg_link_predict"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    deg AS (SELECT s AS n, count(*) AS d FROM p GROUP BY s),
    w AS (
      SELECT p1.s AS a, p2.s AS b, count(*) AS n_common,
             sum(1.0 / ln(dz.d)) AS aa
      FROM p p1 JOIN p p2 ON p1.o = p2.o AND p1.s < p2.s
      JOIN deg dz ON dz.n = p1.o
      GROUP BY p1.s, p2.s)
    SELECT a AS norm_a, b AS norm_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(aa, 4) AS adamic_adar,
           CAST(da.d * db.d AS BIGINT) AS pref_attach
    FROM w JOIN deg da ON da.n = a JOIN deg db ON db.n = b
    WHERE n_common >= 3
      AND NOT EXISTS (SELECT 1 FROM p WHERE p.s = a AND p.o = b)
"""

KG["kg_bfs_hops"] = f"""
    WITH RECURSIVE p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    r(node, hop) AS (
      SELECT DISTINCT s, 0 FROM p
      WHERE s IN ('zetamycin', 'actozine', 'arvel syndrome')
      UNION
      SELECT p.o, r.hop + 1 FROM r JOIN p ON p.s = r.node
      WHERE r.hop < 3)
    SELECT node AS norm, CAST(min(hop) AS BIGINT) AS hop
    FROM r GROUP BY node
"""

KG["kg_weighted_hops"] = f"""
    WITH RECURSIVE triples AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    e AS (SELECT subj, obj, CAST(1.0 AS DOUBLE) / count(*) AS cost
          FROM triples GROUP BY subj, obj),
    r(node, dist, hops) AS (
      SELECT DISTINCT subj, CAST(0.0 AS DOUBLE), 0 FROM e
      WHERE subj IN ('zetamycin', 'actozine', 'arvel syndrome')
      UNION ALL
      SELECT e.obj, r.dist + e.cost, r.hops + 1
      FROM r JOIN e ON e.subj = r.node WHERE r.hops < 3)
    SELECT node AS norm, min(dist) AS dist FROM r GROUP BY node
"""

KG["kg_edge_activity"] = f"""
    WITH triples AS (
      SELECT DISTINCT a.norm AS na, b.norm AS nb,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    j AS (
      SELECT p.na AS norm_a, p.nb AS norm_b, p.conv_id,
             date_trunc('hour', t.ts) AS bucket_ts
      FROM triples p JOIN {TR} t
        ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
      WHERE p.na < p.nb)
    SELECT norm_a, norm_b, bucket_ts,
           CAST(count(*) AS BIGINT) AS n_cooc,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
    FROM j GROUP BY norm_a, norm_b, bucket_ts
"""

KG["kg_edge_evidence"] = f"""
    WITH triples AS (
      SELECT DISTINCT a.norm AS na, b.norm AS nb,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    t AS (
      SELECT na AS norm_a, nb AS norm_b, conv_id, turn_idx, sent_idx,
             row_number() OVER (PARTITION BY na, nb
                                ORDER BY conv_id, turn_idx, sent_idx)
               AS evidence_rank
      FROM triples WHERE na < nb)
    SELECT * FROM t WHERE evidence_rank <= 3
"""

KG["kg_kcore"] = (
    f"SELECT norm, core_degree "
    f"FROM read_parquet('{SYNTH}/gold_kcore.parquet')"
)

# Shared CTE prefix for the graph-aware canonicalization chain: distinct
# sentence pairs -> thresholded neighborhood-Jaccard alias pairs ->
# recursive min-label alias components.
_CANON_CTES = f"""
    p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    w AS (
      SELECT p1.s AS a, p2.s AS b, count(*) AS n_shared
      FROM p p1 JOIN p p2 ON p1.o = p2.o AND p1.s < p2.s
      GROUP BY p1.s, p2.s),
    deg AS (SELECT s AS n, count(*) AS d FROM p GROUP BY s),
    al AS (
      SELECT a, b FROM w JOIN deg da ON da.n = a JOIN deg db ON db.n = b
      WHERE n_shared >= 3
        AND round(n_shared * 1.0 / (da.d + db.d - n_shared), 4) >= 0.5),
    sym AS (SELECT a AS s, b AS o FROM al
            UNION ALL SELECT b, a FROM al),
    reach(node, comp) AS (
      SELECT s, s FROM sym
      UNION
      SELECT sym.o, r.comp FROM reach r JOIN sym ON sym.s = r.node),
    cmap AS (SELECT node, min(comp) AS canonical FROM reach GROUP BY node)
"""

KG["kg_canonical_map"] = f"""
    WITH RECURSIVE {_CANON_CTES}
    SELECT node AS norm, canonical FROM cmap
"""

KG["kg_edges_canonical"] = f"""
    WITH RECURSIVE {_CANON_CTES},
    e AS (SELECT s AS subj, o AS obj, count(*) AS weight
          FROM (SELECT DISTINCT a.norm AS s, b.norm AS o,
                       a.conv_id, a.turn_idx, a.sent_idx
                FROM {GM} a JOIN {GM} b
                  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
                 AND a.sent_idx = b.sent_idx
                WHERE a.norm <> b.norm)
          GROUP BY s, o),
    r AS (SELECT coalesce(ms.canonical, e.subj) AS subj,
                 coalesce(mo.canonical, e.obj) AS obj, e.weight
          FROM e LEFT JOIN cmap ms ON ms.node = e.subj
                 LEFT JOIN cmap mo ON mo.node = e.obj)
    SELECT subj, obj, CAST(sum(weight) AS BIGINT) AS weight
    FROM r WHERE subj <> obj GROUP BY subj, obj
"""

KG["kg_entity_trends"] = f"""
    WITH m AS (
      SELECT g.norm, date_trunc('hour', t.ts) AS bucket_ts,
             count(*) AS n
      FROM {GM} g JOIN {TR} t
        ON t.conv_id = g.conv_id AND t.turn_idx = g.turn_idx
      GROUP BY g.norm, date_trunc('hour', t.ts)),
    s AS (SELECT norm, count(*) AS nb, avg(n) AS am,
                 stddev_samp(n) AS sd
          FROM m GROUP BY norm)
    SELECT m.norm, m.bucket_ts, CAST(m.n AS BIGINT) AS n,
           CASE WHEN s.nb < 2 OR s.sd = 0 THEN 0.0
                ELSE round((m.n - s.am) / s.sd, 4) END AS z,
           CASE WHEN s.nb < 2 OR s.sd = 0 THEN FALSE
                ELSE abs(round((m.n - s.am) / s.sd, 4)) >= 2.0
           END AS spike
    FROM m JOIN s ON s.norm = m.norm
"""

KG["kg_edges_diff"] = f"""
    WITH new_t AS (
      SELECT subj, obj, count(*) AS weight FROM (
        SELECT DISTINCT a.norm AS subj, b.norm AS obj,
               a.conv_id, a.turn_idx, a.sent_idx
        FROM {GM} a JOIN {GM} b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
         AND a.sent_idx = b.sent_idx
        WHERE a.norm <> b.norm)
      GROUP BY subj, obj),
    old_t AS (
      SELECT subj, obj, count(*) AS weight FROM (
        SELECT DISTINCT a.norm AS subj, b.norm AS obj,
               a.conv_id, a.turn_idx, a.sent_idx
        FROM {GM} a JOIN {GM} b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
         AND a.sent_idx = b.sent_idx
        WHERE a.norm <> b.norm
          AND CAST(substr(a.conv_id, 5) AS BIGINT) % 2 = 0)
      GROUP BY subj, obj),
    j AS (
      SELECT coalesce(o.subj, n.subj) AS subj,
             coalesce(o.obj, n.obj) AS obj,
             o.weight AS wo, n.weight AS wn
      FROM old_t o FULL OUTER JOIN new_t n
        ON n.subj = o.subj AND n.obj = o.obj)
    SELECT subj, obj,
           CAST(coalesce(wo, 0) AS BIGINT) AS weight_old,
           CAST(coalesce(wn, 0) AS BIGINT) AS weight_new,
           CASE WHEN wo IS NULL THEN 'added'
                WHEN wn IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM j WHERE coalesce(wo, 0) <> coalesce(wn, 0)
"""

KG["kg_export_ntriples"] = f"""
    WITH nodes AS (
      SELECT substr(md5(cls || '|' || norm), 1, 16) AS node_id, norm, cls
      FROM {GM} GROUP BY norm, cls),
    triples AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    clsmap AS (SELECT norm, min(cls) AS cls FROM {GM} GROUP BY norm),
    edges AS (
      SELECT substr(md5(cs.cls || '|' || subj), 1, 16) AS subj_id,
             substr(md5(co.cls || '|' || obj), 1, 16) AS obj_id,
             count(*) AS weight
      FROM triples t
      JOIN clsmap cs ON t.subj = cs.norm
      JOIN clsmap co ON t.obj = co.norm
      GROUP BY subj, obj, cs.cls, co.cls)
    SELECT '<urn:kg:n:' || node_id
           || '> <http://www.w3.org/2000/01/rdf-schema#label> "'
           || replace(replace(norm, '\', '\\'), '"', '\"') || '" .' AS line
    FROM nodes
    UNION ALL
    SELECT '<urn:kg:n:' || node_id
           || '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:kg:c:'
           || replace(cls, ' ', '_') || '> .'
    FROM nodes
    UNION ALL
    SELECT '<urn:kg:n:' || subj_id || '> <urn:kg:p:co_occurs_with> <urn:kg:n:'
           || obj_id || '> .'
    FROM edges
    UNION ALL
    SELECT '<urn:kg:s:' || subj_id || '-' || obj_id
           || '> <urn:kg:p:weight> "' || CAST(weight AS VARCHAR)
           || '"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    FROM edges
"""

KG["kg_harmonic"] = f"""
    WITH RECURSIVE p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    r(root, node, hop) AS (
      SELECT s, s, 0 FROM (SELECT DISTINCT s FROM p
        WHERE s IN ('zetamycin', 'actozine', 'arvel syndrome')) seeds(s)
      UNION
      SELECT r.root, p.o, r.hop + 1 FROM r JOIN p ON p.s = r.node
      WHERE r.hop < 3),
    m AS (SELECT root, node, min(hop) AS hop FROM r GROUP BY root, node)
    SELECT root,
           CAST(count(*) FILTER (WHERE hop > 0) AS BIGINT) AS n_reached,
           round(sum(CASE WHEN hop > 0 THEN 1.0 / hop ELSE 0 END), 4)
             AS harmonic
    FROM m GROUP BY root
"""

KG["conv_templates"] = f"""
    WITH n AS (
      SELECT role,
             regexp_replace(regexp_replace(lower(coalesce(text, '')),
                            '^\\s+', ''), '\\s+$', '') AS text_norm,
             conv_id
      FROM {TR})
    SELECT role, text_norm,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           CAST(count(*) AS BIGINT) AS n_turns
    FROM n WHERE text_norm <> ''
    GROUP BY role, text_norm
    HAVING count(DISTINCT conv_id) >= 3
"""

KG["kg_component_stats"] = f"""
    WITH RECURSIVE p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    pd AS (SELECT DISTINCT s, o FROM p),
    reach(node, comp) AS (
      SELECT s, s FROM pd
      UNION
      SELECT pd.o, r.comp FROM reach r JOIN pd ON pd.s = r.node),
    lab AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
    e AS (SELECT s, o, count(*) AS weight FROM p WHERE s < o
          GROUP BY s, o),
    ec AS (SELECT l.component, count(*) AS n_edges,
                  CAST(sum(e.weight) AS BIGINT) AS total_weight
           FROM e JOIN lab l ON l.node = e.s GROUP BY 1),
    nc AS (SELECT component, count(*) AS n_nodes FROM lab GROUP BY 1)
    SELECT nc.component, nc.n_nodes, ec.n_edges, ec.total_weight,
           round(2.0 * ec.n_edges / (nc.n_nodes * (nc.n_nodes - 1)), 4)
             AS density
    FROM nc JOIN ec ON ec.component = nc.component
"""

# deterministic synchronous weighted LPA, 4 unrolled rounds: per round,
# sum incident edge weight per (node, neighbor label), keep the max-weight
# label(s), break ties lexicographically. Mirrors
# ops/graph_analytics.label_propagation exactly.
_LPA_STEP = """
    s{i} AS (
      SELECT e.s AS node, l.lbl, sum(e.w) AS w
      FROM esym e JOIN it{j} l ON l.node = e.o GROUP BY 1, 2),
    it{i} AS (
      SELECT node, min(lbl) AS lbl FROM (
        SELECT node, lbl, w, max(w) OVER (PARTITION BY node) AS mw
        FROM s{i}) WHERE w = mw GROUP BY node)"""

KG["kg_communities"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    esym AS (SELECT s, o, count(*) AS w FROM p GROUP BY s, o),
    it0 AS (SELECT DISTINCT s AS node, s AS lbl FROM esym),
    {",".join(_LPA_STEP.format(i=i, j=i - 1) for i in range(1, 5))}
    SELECT node AS norm, lbl AS community FROM it4
"""

KG["kg_meta_paths"] = f"""
    WITH pairs AS (
      SELECT a.conv_id, a.turn_idx, a.sent_idx,
             a.norm AS subj, b.norm AS obj, a."end" AS ae,
             greatest(b.start, a."end") AS bs
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx AND b.mention_idx = a.mention_idx + 1
      WHERE a.norm <> b.norm),
    g AS (
      SELECT p.subj, p.obj,
             lower(substr(s.text, p.ae + 1, p.bs - p.ae)) AS gap
      FROM pairs p JOIN {GS} s
        ON p.conv_id = s.conv_id AND p.turn_idx = s.turn_idx
       AND p.sent_idx = s.sent_idx),
    t AS (
      SELECT subj, obj, len(regexp_extract_all(gap, '[a-z]+')) AS ntok,
             regexp_replace(
               regexp_replace(gap, '^[^a-z]+|[^a-z]+$', '', 'g'),
               '[^a-z]+', '_', 'g') AS predc
      FROM g),
    te AS (
      SELECT subj,
             CASE WHEN ntok BETWEEN 1 AND 3 THEN predc
                  ELSE 'co_occurs_with' END AS pred,
             obj, count(*) AS weight
      FROM t GROUP BY 1, 2, 3)
    SELECT e1.pred AS pred_a, e2.pred AS pred_b,
           count(*) AS n_paths,
           CAST(sum(e1.weight * e2.weight) AS BIGINT) AS path_weight
    FROM te e1 JOIN te e2 ON e2.subj = e1.obj
    WHERE e1.subj <> e2.obj
    GROUP BY 1, 2
"""

KG["kg_node_attributes"] = f"""
    WITH RECURSIVE base AS (
      SELECT norm, count(*) AS n_mentions,
             count(DISTINCT conv_id) AS n_convs
      FROM {GM} GROUP BY norm),
    p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    e AS (SELECT s, o, count(*) AS weight FROM p GROUP BY s, o),
    deg AS (SELECT s AS norm, count(*) AS degree,
                   CAST(sum(weight) AS BIGINT) AS strength
            FROM e GROUP BY s),
    pd AS (SELECT DISTINCT s, o FROM p),
    reach(node, comp) AS (
      SELECT s, s FROM pd
      UNION
      SELECT pd.o, r.comp FROM reach r JOIN pd ON pd.s = r.node),
    lab AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
    tv AS (
      SELECT g.norm, min(t.ts) AS first_seen, max(t.ts) AS last_seen
      FROM {GM} g JOIN {TR} t
        ON t.conv_id = g.conv_id AND t.turn_idx = g.turn_idx
      GROUP BY g.norm)
    SELECT b.norm, b.n_mentions,
           coalesce(d.degree, 0) AS degree,
           coalesce(d.strength, 0) AS strength,
           coalesce(l.component, b.norm) AS component,
           b.n_convs, tv.first_seen, tv.last_seen
    FROM base b
    LEFT JOIN deg d ON d.norm = b.norm
    LEFT JOIN lab l ON l.node = b.norm
    JOIN tv ON tv.norm = b.norm
"""

KG["kg_betweenness"] = (
    f"SELECT norm, betweenness "
    f"FROM read_parquet('{SYNTH}/gold_betweenness.parquet')")

KG["kg_negative_samples"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    e AS (SELECT DISTINCT s, o FROM p WHERE s < o),
    nodes AS (
      SELECT node, row_number() OVER (ORDER BY node) AS r
      FROM (SELECT DISTINCT s AS node FROM p)),
    n AS (SELECT count(*) AS cnt FROM nodes),
    cand AS (
      SELECT e.s AS subj, e.o AS pos_obj, j.slot,
             ((ns.r * 2654435761 + no.r * 40503 + j.slot * 97)
               % 4294967296) % (SELECT cnt FROM n) + 1 AS ri
      FROM e
      JOIN nodes ns ON ns.node = e.s
      JOIN nodes no ON no.node = e.o
      CROSS JOIN (VALUES (1), (2)) AS j(slot)),
    neg AS (
      SELECT c.subj, nn.node AS neg_obj, CAST(c.slot AS BIGINT) AS slot
      FROM cand c JOIN nodes nn ON nn.r = c.ri
      WHERE nn.node <> c.subj)
    SELECT subj, neg_obj, slot FROM neg
    WHERE NOT EXISTS (
      SELECT 1 FROM e
      WHERE e.s = least(neg.subj, neg.neg_obj)
        AND e.o = greatest(neg.subj, neg.neg_obj))
"""


KG["conv_dialog_acts"] = f"""
    WITH t AS (
      SELECT conv_id,
             trim(coalesce(text, ''),
                  ' ' || chr(9) || chr(10) || chr(13)) AS txt
      FROM {TR}),
    a AS (
      SELECT conv_id,
             CASE WHEN txt = '' THEN 'empty'
                  WHEN txt LIKE '%?' THEN 'question'
                  WHEN regexp_extract(lower(txt), '^([a-z]+)', 1)
                    IN ('add', 'check', 'create', 'describe', 'explain', 'find', 'fix', 'generate', 'give', 'help', 'list', 'make', 'please', 'remove', 'run', 'show', 'summarize', 'tell', 'update', 'write') THEN 'command'
                  ELSE 'statement' END AS act
      FROM t)
    SELECT conv_id, act, CAST(count(*) AS BIGINT) AS n_turns
    FROM a GROUP BY 1, 2
"""

KG["kg_eccentricity"] = f"""
    WITH RECURSIVE p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    -- min-hop per ordered (root, node) pair; hop cap 8 = 4x the test
    -- corpus' measured diameter of 2 (the engine's BFS is exact and
    -- uncapped; recursion cost scales linearly with the cap because
    -- cycles re-derive every pair at every hop up to it)
    r(root, node, hop) AS (
      SELECT s, s, 0 FROM (SELECT DISTINCT s FROM p)
      UNION
      SELECT r.root, p.o, r.hop + 1 FROM r JOIN p ON p.s = r.node
      WHERE r.hop < 8),
    m AS (SELECT root, node, min(hop) AS hop FROM r GROUP BY root, node)
    SELECT root AS norm,
           CAST(max(hop) AS BIGINT) AS eccentricity,
           CAST(count(*) FILTER (WHERE hop > 0) AS BIGINT) AS n_reachable
    FROM m GROUP BY root
"""

KG["kg_type_pairs"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    e AS (SELECT s, o, count(*) AS weight FROM p WHERE s < o
          GROUP BY s, o),
    cm AS (SELECT norm, min(cls) AS cls FROM {GM} GROUP BY norm)
    SELECT least(ca.cls, cb.cls) AS cls_a,
           greatest(ca.cls, cb.cls) AS cls_b,
           count(*) AS n_edges,
           CAST(sum(e.weight) AS BIGINT) AS total_weight
    FROM e JOIN cm ca ON ca.norm = e.s
           JOIN cm cb ON cb.norm = e.o
    GROUP BY 1, 2
"""

KG["conv_topics"] = f"""
    WITH c AS (
      SELECT conv_id, norm, count(*) AS n
      FROM {GM} GROUP BY conv_id, norm),
    s AS (
      SELECT conv_id, norm, n,
             max(n) OVER (PARTITION BY conv_id) AS mx,
             count(*) OVER (PARTITION BY conv_id)
               AS n_distinct_entities
      FROM c)
    SELECT conv_id, min(norm) AS top_entity,
           CAST(min(n) AS BIGINT) AS n_mentions_top,
           CAST(min(n_distinct_entities) AS BIGINT)
             AS n_distinct_entities
    FROM s WHERE n = mx GROUP BY conv_id
"""

KG["kg_growth"] = f"""
    WITH triples AS (
      SELECT DISTINCT a.norm AS na, b.norm AS nb,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    fs AS (
      SELECT p.na, p.nb, min(t.ts) AS first_seen
      FROM triples p JOIN {TR} t
        ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
      WHERE p.na < p.nb
      GROUP BY p.na, p.nb)
    SELECT date_trunc('day', first_seen) AS day,
           count(*) AS n_new_edges
    FROM fs GROUP BY 1
"""

KG["kg_integrity"] = f"""
    WITH nodes AS (
      SELECT substr(md5(cls || '|' || norm), 1, 16) AS node_id
      FROM {GM} GROUP BY norm, cls),
    triples AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    clsmap AS (SELECT norm, min(cls) AS cls FROM {GM} GROUP BY norm),
    edges AS (
      SELECT substr(md5(cs.cls || '|' || subj), 1, 16) AS subj_id, subj,
             substr(md5(co.cls || '|' || obj), 1, 16) AS obj_id, obj,
             count(*) AS weight
      FROM triples t JOIN clsmap cs ON cs.norm = t.subj
                     JOIN clsmap co ON co.norm = t.obj
      GROUP BY 1, 2, 3, 4)
    SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(*) FROM edges
             WHERE subj_id NOT IN (SELECT node_id FROM nodes))
             AS n_dangling_subj,
           (SELECT count(*) FROM edges
             WHERE obj_id NOT IN (SELECT node_id FROM nodes))
             AS n_dangling_obj,
           (SELECT count(*) FROM edges WHERE subj = obj) AS n_self_loops,
           (SELECT count(*) FROM edges WHERE weight <= 0) AS n_bad_weight
"""

KG["kg_mention_yield"] = f"""
    WITH tu AS (
      SELECT role, count(*) AS n_turns,
             CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS n_chars
      FROM {TR} GROUP BY role),
    m AS (
      SELECT t.role, count(*) AS n_mentions
      FROM {GM} g JOIN {TR} t
        ON t.conv_id = g.conv_id AND t.turn_idx = g.turn_idx
      GROUP BY t.role)
    SELECT tu.role, coalesce(m.n_mentions, 0) AS n_mentions,
           tu.n_turns, tu.n_chars,
           round(1000.0 * coalesce(m.n_mentions, 0)
                 / (CASE WHEN tu.n_chars > 0 THEN tu.n_chars ELSE 1 END),
                 4) AS mentions_per_kchar
    FROM tu LEFT JOIN m ON m.role = tu.role
"""

RELATIONAL["docs_cross_dup_ngrams"] = """
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents),
    pos AS (
      SELECT doc_id, t,
             unnest(generate_series(1, len(t) - 2)) AS i
      FROM tok),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM pos),
    df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    per AS (
      SELECT s.doc_id,
             count(*) AS n_shingles,
             count(*) FILTER (WHERE d.df >= 2) AS n_dup_shingles
      FROM sh s JOIN df d USING (shingle)
      GROUP BY s.doc_id)
    SELECT doc_id, n_shingles, n_dup_shingles,
           CAST(n_dup_shingles AS DOUBLE) / n_shingles AS dup_frac
    FROM per
"""

KG["kg_assortativity"] = f"""
    WITH pairs AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm
    ), deg AS (SELECT subj AS node, count(*) AS d FROM pairs GROUP BY subj),
    xy AS (
      SELECT ds.d AS x, dd.d AS y
      FROM pairs p JOIN deg ds ON p.subj = ds.node
                   JOIN deg dd ON p.obj = dd.node
    ), s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM xy)
    SELECT CAST(n AS BIGINT) AS n_edges,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS assortativity
    FROM s
"""

RELATIONAL["events_mad_outliers"] = """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, abs(e.value - m.med) AS dev, m.med
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(count(d.value) AS BIGINT) AS n_values,
           CAST(count(*) FILTER (WHERE d.dev > 3.0 * a.mad) AS BIGINT)
             AS n_outliers,
           any_value(d.med) AS med, any_value(a.mad) AS mad
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
"""

KG["conv_parrot_score"] = f"""
    WITH rp AS (
      SELECT conv_id, turn_idx, text AS prompt, ntext AS response
      FROM (SELECT conv_id, turn_idx, role, text,
                   lead(role) OVER w AS nrole, lead(text) OVER w AS ntext
            FROM {TR}
            WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
      WHERE role = 'user' AND nrole = 'assistant'),
    rtok AS (
      SELECT conv_id, turn_idx,
             list_filter(string_split_regex(lower(response), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM rp),
    rsh AS (
      SELECT DISTINCT conv_id, turn_idx, array_to_string(t[i:i+1], ' ') AS sh
      FROM (SELECT conv_id, turn_idx, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM rtok)),
    ptok AS (
      SELECT conv_id, turn_idx,
             list_filter(string_split_regex(lower(prompt), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM rp),
    psh AS (
      SELECT DISTINCT conv_id, turn_idx, array_to_string(t[i:i+1], ' ') AS sh
      FROM (SELECT conv_id, turn_idx, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM ptok))
    SELECT r.conv_id, r.turn_idx,
           CAST(count(*) AS BIGINT) AS n_resp_ngrams,
           CAST(count(*) FILTER (WHERE p.sh IS NOT NULL) AS BIGINT)
             AS n_echoed,
           CAST(count(*) FILTER (WHERE p.sh IS NOT NULL) AS DOUBLE)
             / count(*) AS echo_frac
    FROM rsh r LEFT JOIN psh p
      ON p.conv_id = r.conv_id AND p.turn_idx = r.turn_idx AND p.sh = r.sh
    GROUP BY r.conv_id, r.turn_idx
"""

KG["kg_transition_edges"] = f"""
    WITH tn AS (SELECT DISTINCT conv_id, turn_idx, norm FROM {GM})
    SELECT a.norm AS src, b.norm AS dst, count(*) AS weight
    FROM tn a JOIN tn b
      ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
    WHERE a.norm <> b.norm
    GROUP BY a.norm, b.norm
"""

GHI = f"read_parquet('{SYNTH}/gold_hits.parquet')"
KG["kg_hits"] = f"SELECT norm, hub, authority FROM {GHI}"

MEDIA_TBL = f"read_parquet('{SYNTH}/media.parquet')"
KG["media_dedup"] = f"""
    SELECT min(item_id) AS item_id, CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(octet_length(payload)) AS BIGINT) AS payload_bytes
    FROM {MEDIA_TBL} GROUP BY payload
"""

KG["kg_modularity"] = f"""
    WITH p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    esym AS (SELECT s, o, count(*) AS w FROM p GROUP BY s, o),
    it0 AS (SELECT DISTINCT s AS node, s AS lbl FROM esym),
    {",".join(_LPA_STEP.format(i=i, j=i - 1) for i in range(1, 5))},
    comm AS (SELECT node, lbl FROM it4),
    twt AS (SELECT sum(w) AS tw FROM esym),
    wint AS (SELECT coalesce(sum(e.w), 0) AS win
             FROM esym e
             JOIN comm c1 ON c1.node = e.s
             JOIN comm c2 ON c2.node = e.o
             WHERE c1.lbl = c2.lbl),
    st AS (SELECT s AS node, sum(w) AS st FROM esym GROUP BY s),
    sc AS (SELECT c.lbl, sum(st.st) AS sc
           FROM st JOIN comm c ON c.node = st.node GROUP BY c.lbl),
    sq AS (SELECT sum(sc * sc) AS ssq, count(*) AS nc FROM sc)
    SELECT CAST(nc AS BIGINT) AS n_communities,
           CAST(win AS DOUBLE) / CAST(tw AS DOUBLE)
             - CAST(ssq AS DOUBLE)
               / (CAST(tw AS DOUBLE) * CAST(tw AS DOUBLE)) AS modularity
    FROM twt, wint, sq
"""

KG["kg_entity_recurrence"] = f"""
    WITH tn AS (SELECT DISTINCT conv_id, turn_idx, norm FROM {GM}),
    g AS (
      SELECT norm, conv_id,
             CAST(turn_idx AS BIGINT)
               - CAST(lag(turn_idx) OVER
                   (PARTITION BY conv_id, norm ORDER BY turn_idx)
                 AS BIGINT) AS gap
      FROM tn)
    SELECT norm,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap,
           CAST(count(*) FILTER (WHERE gap >= 2) AS BIGINT) AS n_resurfaces
    FROM g GROUP BY norm
"""

KG["conv_c4_line_filter"] = f"""
    WITH d AS (
      SELECT conv_id,
             string_agg(text, chr(10) ORDER BY turn_idx) AS text
      FROM {TR} GROUP BY conv_id),
    f AS (
      SELECT conv_id,
             list_filter(string_split(text, chr(10)),
               x -> regexp_matches(trim(x, ' ' || chr(9) || chr(13)),
                                   '[.!?"'']$')
                    AND len(regexp_extract_all(x, '[^\\s]+')) >= 5
                    AND NOT contains(lower(x), 'javascript')) AS kept,
             len(string_split(text, chr(10))) AS n_lines
      FROM d
      WHERE NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{'))
    SELECT conv_id, array_to_string(kept, chr(10)) AS text_clean,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(n_lines - len(kept) AS BIGINT) AS n_removed
    FROM f WHERE len(kept) >= 3
"""

KG["conv_dedup"] = f"""
    WITH fp AS (
      SELECT conv_id, md5(string_agg(text, chr(10) ORDER BY turn_idx))
               AS text_md5
      FROM {TR} GROUP BY conv_id)
    SELECT min(conv_id) AS conv_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM fp GROUP BY text_md5
"""

KG["kg_entity_roles"] = f"""
    WITH m AS (
      SELECT g.norm, t.role
      FROM {GM} g JOIN {TR} t
        ON g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx)
    SELECT norm,
           CAST(count(*) FILTER (WHERE role = 'user') AS BIGINT) AS n_user,
           CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT)
             AS n_assistant,
           CAST(count(*) FILTER (WHERE role NOT IN ('user', 'assistant'))
                AS BIGINT) AS n_other,
           CAST(count(*) AS BIGINT) AS n_mentions,
           CAST(count(*) FILTER (WHERE role = 'user') AS DOUBLE) / count(*)
             AS user_share
    FROM m GROUP BY norm
"""

KG["conv_dup_line_keep_first"] = f"""
    WITH d AS (
      SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS text
      FROM {TR} GROUP BY conv_id),
    ln AS (SELECT conv_id, string_split(text, chr(10)) AS l FROM d),
    ex AS (SELECT conv_id, unnest(generate_series(1, len(l))) AS idx,
                  unnest(l) AS line FROM ln),
    cnt AS (SELECT line, count(*) AS c, min(conv_id) AS md FROM ex
            WHERE regexp_matches(line, '[^ ' || chr(9) || ']')
            GROUP BY line),
    kept AS (
      SELECT e.conv_id,
             string_agg(e.line, chr(10) ORDER BY e.idx) AS text_clean,
             count(*) AS n_kept
      FROM ex e LEFT JOIN cnt c ON e.line = c.line
      WHERE c.c IS NULL OR c.c < 2 OR e.conv_id = c.md
      GROUP BY e.conv_id)
    SELECT ln.conv_id,
           COALESCE(k.text_clean, '') AS text_clean,
           CAST(len(ln.l) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
    FROM ln LEFT JOIN kept k ON ln.conv_id = k.conv_id
"""

GRP = f"read_parquet('{SYNTH}/gold_rp_reduce.parquet')"
RELATIONAL["embeddings_rp_reduce"] = \
    f"SELECT vec_id, dim_idx, value FROM {GRP}"

RELATIONAL["docs_containment_pairs"] = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS n_a, len(b.s) AS n_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, inter, n_a, n_b FROM pairs
    WHERE inter * 1.0 / least(n_a, n_b) >= 0.4
"""

RELATIONAL["docs_vocab_growth"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    f AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
    mx AS (SELECT max(doc_id) AS m FROM documents),
    b AS (SELECT CAST((fd * 20) // (m + 1) AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS new_terms
          FROM f CROSS JOIN mx GROUP BY 1)
    SELECT bucket, new_terms,
           CAST(sum(new_terms) OVER (ORDER BY bucket) AS BIGINT)
             AS cum_vocab
    FROM b ORDER BY bucket
"""

RELATIONAL["docs_zipf_slope"] = """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
    r AS (SELECT cnt,
                 row_number() OVER (ORDER BY cnt DESC, term) AS rnk
          FROM tc),
    t AS (SELECT ln(cnt * 1.0) AS y, ln(rnk * 1.0) AS x
          FROM r WHERE rnk <= 1000)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(y, x), 6) AS slope,
           round(regr_intercept(y, x), 6) AS intercept
    FROM t
"""

RELATIONAL["docs_ngram_novelty"] = """
    WITH tok AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text),
                                 '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM tok WHERE len(t) >= 3),
    d AS (SELECT DISTINCT doc_id, g FROM g),
    f AS (SELECT g, min(doc_id) AS fd FROM d GROUP BY 1)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE fd = doc_id) AS BIGINT) AS n_novel
    FROM d JOIN f USING (g) GROUP BY doc_id
"""

KG["kg_closeness"] = f"""
    WITH RECURSIVE p AS (
      SELECT DISTINCT a.norm AS s, b.norm AS o
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    -- min-hop per ordered (root, node) pair; same hop cap 8 = 4x the
    -- measured test-corpus diameter as kg_eccentricity (the engine's
    -- BFS is exact and uncapped)
    r(root, node, hop) AS (
      SELECT s, s, 0 FROM (SELECT DISTINCT s FROM p)
      UNION
      SELECT r.root, p.o, r.hop + 1 FROM r JOIN p ON p.s = r.node
      WHERE r.hop < 8),
    m AS (SELECT root, node, min(hop) AS hop FROM r GROUP BY root, node)
    SELECT root AS norm,
           CAST(count(*) FILTER (WHERE hop > 0) AS BIGINT) AS n_reachable,
           CAST(coalesce(sum(hop) FILTER (WHERE hop > 0), 0) AS BIGINT)
             AS sum_dist
    FROM m GROUP BY root
"""

KG["kg_reciprocity"] = f"""
    WITH tn AS (SELECT DISTINCT conv_id, turn_idx, norm FROM {GM}),
    e AS (
      SELECT DISTINCT a.norm AS src, b.norm AS dst
      FROM tn a JOIN tn b
        ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
      WHERE a.norm <> b.norm)
    SELECT e.src AS norm, CAST(count(*) AS BIGINT) AS n_out,
           CAST(count(r.src) AS BIGINT) AS n_recip
    FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
    GROUP BY e.src
"""

KG["conv_tool_transitions"] = f"""
    WITH c AS (
      SELECT conv_id, turn_idx, tool FROM {TR}
      WHERE tool IS NOT NULL AND tool <> ''),
    s AS (
      SELECT tool,
             lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS next_tool
      FROM c)
    SELECT tool, next_tool, CAST(count(*) AS BIGINT) AS n
    FROM s WHERE next_tool IS NOT NULL GROUP BY 1, 2
"""

RELATIONAL["docs_keywords"] = """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    t AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0
                              / df.df), 4) AS tfidf
      FROM tf JOIN df USING (term) WHERE df.df >= 2),
    r AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM t)
    SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
"""

RELATIONAL["docs_lexical_diversity"] = """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    n AS (SELECT doc_id, sum(tf) AS n_tokens, count(*) AS n_types
          FROM tf GROUP BY 1)
    SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
           CAST(n.n_types AS BIGINT) AS n_types,
           round(-sum((tf.tf * 1.0 / n.n_tokens)
                      * ln(tf.tf * 1.0 / n.n_tokens)), 4) AS entropy
    FROM tf JOIN n USING (doc_id)
    GROUP BY n.doc_id, n.n_tokens, n.n_types
"""

GCMP = f"read_parquet('{SYNTH}/gold_compression.parquet')"
KG["conv_compression"] = \
    f"SELECT conv_id, n_turns, raw_bytes, comp_bytes FROM {GCMP}"

GCMH = f"read_parquet('{SYNTH}/gold_conv_minhash.parquet')"
KG["conv_minhash_pairs"] = \
    f"SELECT conv_a, conv_b, est_jaccard FROM {GCMH}"

RELATIONAL["events_daily_growth"] = """
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, n,
           CAST(coalesce(lag(n) OVER (PARTITION BY event_type
                                      ORDER BY day), 0) AS BIGINT)
             AS prev_n
    FROM d
"""

RELATIONAL["docs_dup_pairs_by_source"] = f"""
    WITH p AS (SELECT doc_a, doc_b FROM {GMH}),
    j AS (
      SELECT least(da.source, db.source) AS src_a,
             greatest(da.source, db.source) AS src_b
      FROM p JOIN documents da ON da.doc_id = p.doc_a
             JOIN documents db ON db.doc_id = p.doc_b)
    SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY 1, 2
"""

RELATIONAL["docs_top_ngrams"] = """
    WITH tok AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents),
    g AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      FROM tok WHERE len(t) >= 3)
    SELECT gram, CAST(count(*) AS BIGINT) AS cnt
    FROM g GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20
"""

RELATIONAL["events_ewma"] = """
    WITH r AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events)
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           round(list_reduce(
                   list(CASE WHEN rn = 1
                             THEN value * power(2.0, -(n - 1))
                             ELSE value * power(2.0, -(n - rn + 1)) END
                        ORDER BY rn),
                   (a, b) -> a + b), 4) AS ewma
    FROM r GROUP BY user_id
"""

KG["kg_bridges"] = (
    f"SELECT norm_a, norm_b "
    f"FROM read_parquet('{SYNTH}/gold_bridges.parquet')")

RELATIONAL["docs_readability"] = """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
             AS n_words,
           CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
             AS n_sentences,
           CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
             AS n_vowel_groups
    FROM documents
"""

RELATIONAL["docs_lang_mismatch"] = f"""
    SELECT d.lang AS declared, g.lang_pred AS predicted,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN {GLI} g ON g.doc_id = d.doc_id
    GROUP BY 1, 2
"""

RELATIONAL["docs_length_integrity"] = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
             AS n_mismatch
    FROM documents GROUP BY source
"""

KG["kg_shortest_paths"] = (
    f"SELECT seed, norm, hops, path "
    f"FROM read_parquet('{SYNTH}/gold_shortest_paths.parquet')")

RELATIONAL["docs_dedup_retention"] = f"""
    WITH dropped AS (
      SELECT DISTINCT greatest(doc_a, doc_b) AS doc_id FROM {GMH})
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(x.doc_id) AS BIGINT) AS n_dropped
    FROM documents d LEFT JOIN dropped x ON x.doc_id = d.doc_id
    GROUP BY d.source
"""

RELATIONAL["events_type_transitions"] = """
    WITH s AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
"""

RELATIONAL["events_interarrival"] = """
    WITH s AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(date_diff('microsecond', prev_ts, ts) // 1000000)
                AS BIGINT) AS total_gap_s,
           CAST(max(date_diff('microsecond', prev_ts, ts) // 1000000)
                AS BIGINT) AS max_gap_s
    FROM s WHERE prev_ts IS NOT NULL
    GROUP BY user_id
"""

RELATIONAL["events_user_type_entropy"] = """
    WITH tf AS (
      SELECT user_id, event_type, count(*) AS tf
      FROM events GROUP BY 1, 2),
    n AS (SELECT user_id, sum(tf) AS n_events, count(*) AS n_types
          FROM tf GROUP BY 1)
    SELECT n.user_id, CAST(n.n_events AS BIGINT) AS n_events,
           CAST(n.n_types AS BIGINT) AS n_types,
           round(-sum((tf.tf * 1.0 / n.n_events)
                      * ln(tf.tf * 1.0 / n.n_events)), 4) AS entropy
    FROM tf JOIN n USING (user_id)
    GROUP BY n.user_id, n.n_events, n.n_types
"""

RELATIONAL["docs_quality_percentile"] = """
    WITH s AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text,
               '(?i)\\b(?:the|a|an|and|or|of|to|in|is|that|it|for|on|with|as|was|at|by|be|this)\\b')) * 1.0
               / greatest(len(regexp_extract_all(text, '[^\\s]+')), 1)
               AS stopword_ratio
      FROM documents)
    SELECT doc_id, source, stopword_ratio,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY stopword_ratio) AS pct
    FROM s
"""

GIVI = f"read_parquet('{SYNTH}/gold_knn_ivf_incremental.parquet')"
RELATIONAL["knn_ivf_incremental"] = \
    f"SELECT query_id, rank, vec_id FROM {GIVI}"

RELATIONAL["docs_corpus_card"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(len(regexp_extract_all(text, '[^\\s]+'))) AS BIGINT)
             AS total_tokens,
           CAST(count(*) FILTER (WHERE length(text) = 0) AS BIGINT)
             AS n_empty
    FROM documents
"""

RELATIONAL["docs_token_histogram"] = """
    SELECT len(regexp_extract_all(text, '[^\\s]+')) // 64 AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
"""

RELATIONAL["events_burst"] = """
    WITH c AS (
      SELECT a.user_id, a.event_id, count(*) AS w
      FROM events a JOIN events b
        ON b.user_id = a.user_id
       AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
      GROUP BY 1, 2)
    SELECT user_id, CAST(max(w) AS BIGINT) AS max_burst
    FROM c GROUP BY user_id
"""

KG["conv_window_dedup"] = f"""
    WITH w AS (
      SELECT conv_id,
             concat_ws(chr(10), l3, l2, l1) AS context, text AS target
      FROM (SELECT conv_id, turn_idx, role, text,
                   lag(text, 3) OVER win AS l3,
                   lag(text, 2) OVER win AS l2,
                   lag(text, 1) OVER win AS l1
            FROM {TR}
            WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx))
      WHERE role = 'assistant')
    SELECT context, target, CAST(count(*) AS BIGINT) AS n_copies,
           min(conv_id) AS first_conv
    FROM w GROUP BY 1, 2 HAVING count(*) >= 2
"""

RELATIONAL["tpch_q3_revenue"] = """
    SELECT l_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
"""

RELATIONAL["tpch_q5_region_revenue"] = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
"""

RELATIONAL["lineitem_pruned_profile"] = """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag
"""

RELATIONAL["events_heatmap"] = """
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
"""

KG["kg_entity_lifespan"] = f"""
    SELECT g.norm, min(t.ts) AS first_ts, max(t.ts) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_mentions,
           CAST(count(DISTINCT g.conv_id) AS BIGINT) AS n_convs
    FROM {GM} g JOIN {TR} t
      ON t.conv_id = g.conv_id AND t.turn_idx = g.turn_idx
    GROUP BY g.norm
"""

RELATIONAL["docs_cluster_keywords"] = f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    ti AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0
                              / df.df), 4) AS tfidf
      FROM tf JOIN df USING (term) WHERE df.df >= 2),
    a AS (
      SELECT g.cluster, ti.term, round(sum(ti.tfidf), 4) AS score
      FROM ti JOIN {GKM} g ON g.vec_id = ti.doc_id
      GROUP BY 1, 2),
    r AS (
      SELECT cluster, term, score,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY score DESC, term) AS rank
      FROM a)
    SELECT cluster, CAST(rank AS BIGINT) AS rank, term, score
    FROM r WHERE rank <= 3
"""

RELATIONAL["docs_jsonl_roundtrip"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents
"""

RELATIONAL["tpch_q10_returned_items"] = """
    SELECT c_custkey, c_name, n_name, c_acctbal,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
"""

GPCA = f"read_parquet('{SYNTH}/gold_pca.parquet')"
RELATIONAL["embeddings_pca"] = \
    f"SELECT vec_id, dim_idx, value FROM {GPCA}"

GWALKS = f"read_parquet('{SYNTH}/gold_random_walks.parquet')"
KG["kg_random_walks"] = \
    f"SELECT start, walk_id, step, node FROM {GWALKS}"

KG["kg_walk_skipgrams"] = f"""
    SELECT a.start, a.walk_id, a.step AS center_step,
           a.node AS center, b.node AS context
    FROM {GWALKS} a JOIN {GWALKS} b
      ON a.start = b.start AND a.walk_id = b.walk_id
     AND b.step BETWEEN a.step - 2 AND a.step + 2
     AND b.step != a.step
"""

RELATIONAL["tpch_q6_forecast_revenue"] = """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

RELATIONAL["tpch_q4_late_orders"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

RELATIONAL["tpch_q13_custdist"] = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey,
                 CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

RELATIONAL["tpch_q14_promo_revenue"] = """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
"""

RELATIONAL["tpch_q18_large_orders"] = """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""

RELATIONAL["tpch_q22_dormant_accounts"] = """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
"""

RELATIONAL["events_user_pivot"] = """
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_n,
               ROUND(COALESCE(sum(value) FILTER (WHERE event_type = 'click'), 0), 2) AS click_sum,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error_n,
               ROUND(COALESCE(sum(value) FILTER (WHERE event_type = 'error'), 0), 2) AS error_sum,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_n,
               ROUND(COALESCE(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 2) AS purchase_sum,
               CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup_n,
               ROUND(COALESCE(sum(value) FILTER (WHERE event_type = 'signup'), 0), 2) AS signup_sum,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_n,
               ROUND(COALESCE(sum(value) FILTER (WHERE event_type = 'view'), 0), 2) AS view_sum
        FROM events GROUP BY user_id ORDER BY user_id
"""

RELATIONAL["lineitem_melt"] = """
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice',
             CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount',
             CAST(l_discount AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax',
             CAST(l_tax AS DOUBLE) FROM lineitem)
    ORDER BY l_orderkey, l_linenumber, measure
"""

RELATIONAL["docs_epoch_shuffle"] = """
    SELECT doc_id,
           (doc_id * 2654435761 + 1) % 4294967296 AS shuffle_key
    FROM documents ORDER BY shuffle_key, doc_id
"""

RELATIONAL["docs_split_no_leakage"] = """
    WITH reps AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
      FROM documents)
    SELECT doc_id, rep,
           CASE WHEN (rep * 2654435761) % 4294967296 < 3865470566
                THEN 'train' ELSE 'val' END AS split
    FROM reps ORDER BY doc_id
"""

RELATIONAL["events_autocorr"] = """
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
    l AS (SELECT * FROM (VALUES (1), (2), (3), (7)) AS t(lag_k))
    SELECT a.event_type, CAST(l.lag_k AS BIGINT) AS lag_k,
           round(corr(b.n, a.n), 4) AS acf
    FROM r a
    JOIN l ON true
    JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn + l.lag_k
    GROUP BY 1, 2
"""

RELATIONAL["docs_nb_source_pred"] = """
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tot AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    vocab AS (SELECT term FROM tot ORDER BY c DESC, term LIMIT 512),
    vsz AS (SELECT count(*) AS v FROM vocab),
    vt AS (SELECT t.* FROM toks t JOIN vocab USING (term)),
    cls AS (SELECT source AS cl, count(*) AS nd FROM documents GROUP BY 1),
    nd_all AS (SELECT count(*) AS n FROM documents),
    ctc AS (SELECT source AS cl, term, count(*) AS c FROM vt GROUP BY 1, 2),
    totc AS (SELECT source AS cl, count(*) AS tc FROM vt GROUP BY 1),
    model AS (
      SELECT cls.cl, vocab.term,
             ln((coalesce(ctc.c, 0) + 1.0)
                / (coalesce(totc.tc, 0) + vsz.v)) AS logp
      FROM cls CROSS JOIN vocab CROSS JOIN vsz
      LEFT JOIN totc ON totc.cl = cls.cl
      LEFT JOIN ctc ON ctc.cl = cls.cl AND ctc.term = vocab.term),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM vt GROUP BY 1, 2),
    scores AS (
      SELECT d.doc_id, cls.cl,
             ln(cls.nd * 1.0 / nd_all.n)
               + coalesce(sum(tf.tf * m.logp), 0.0) AS s
      FROM documents d CROSS JOIN cls CROSS JOIN nd_all
      LEFT JOIN tf ON tf.doc_id = d.doc_id
      LEFT JOIN model m ON m.cl = cls.cl AND m.term = tf.term
      GROUP BY d.doc_id, cls.cl, cls.nd, nd_all.n),
    best AS (
      SELECT doc_id, cl, round(s, 4) AS s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(s, 4) DESC, cl) AS rn
      FROM scores)
    SELECT d.doc_id, d.source, b.cl AS pred_source, b.s AS score
    FROM best b JOIN documents d USING (doc_id) WHERE b.rn = 1
"""

GHN = f"read_parquet('{SYNTH}/gold_hard_negatives.parquet')"
RELATIONAL["embedding_hard_negatives"] = \
    f"SELECT vec_id, label, neg_id, neg_label FROM {GHN}"

GKC = f"read_parquet('{SYNTH}/gold_kcenter.parquet')"
RELATIONAL["embedding_kcenter"] = \
    f"SELECT rank, vec_id, dist FROM {GKC}"

RELATIONAL["tpch_q7_nation_volume"] = """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
"""

RELATIONAL["tpch_q15_top_supplier"] = """
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s JOIN rev USING (s_suppkey)
    WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
"""

RELATIONAL["tpch_q17_small_quantity"] = """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
"""

RELATIONAL["tpch_q19_disjunctive_revenue"] = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
"""

GMS = f"read_parquet('{SYNTH}/gold_markov_stationary.parquet')"
RELATIONAL["events_markov_stationary"] = \
    f"SELECT event_type, stationary_p FROM {GMS}"

RELATIONAL["events_theil_sen"] = """
    WITH d AS (
      SELECT event_type,
             date_diff('day', TIMESTAMP '1970-01-01',
                       date_trunc('day', ts)) AS d,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.event_type, (b.n - a.n) / (b.d - a.d) AS slope
      FROM d a JOIN d b ON b.event_type = a.event_type AND b.d > a.d)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           round(median(slope), 4) AS trend
    FROM p GROUP BY 1
"""

RELATIONAL["events_trimmed_mean"] = """
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.1) AS lo,
             quantile_cont(value, 0.9) AS hi
      FROM events GROUP BY 1)
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(e.value), 4) AS trimmed_mean
    FROM events e JOIN b USING (event_type)
    WHERE e.value >= b.lo AND e.value <= b.hi
    GROUP BY 1
"""

RELATIONAL["docs_curriculum"] = """
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rank
    FROM documents
"""

GTP = f"read_parquet('{SYNTH}/gold_triplets.parquet')"
RELATIONAL["embedding_triplets"] = \
    f"SELECT vec_id, label, pos_id, neg_id FROM {GTP}"

RELATIONAL["events_ks_drift"] = """
    WITH ranked AS (SELECT value AS v, count(*) AS c FROM events GROUP BY 1),
    tot AS (SELECT sum(c) AS n FROM ranked),
    g AS (SELECT v, sum(c) OVER (ORDER BY v) * 1.0 / (SELECT n FROM tot)
            AS fg FROM ranked),
    t AS (SELECT event_type, value AS v, count(*) AS c FROM events
          GROUP BY 1, 2),
    tt AS (SELECT event_type, v,
           sum(c) OVER (PARTITION BY event_type ORDER BY v) * 1.0
             / sum(c) OVER (PARTITION BY event_type) AS ft FROM t),
    ty AS (SELECT DISTINCT event_type FROM events),
    ev AS (SELECT ty.event_type, g.v, g.fg FROM ty CROSS JOIN g)
    SELECT ev.event_type, round(max(abs(coalesce(tt.ft, 0) - ev.fg)), 4)
             AS ks
    FROM ev ASOF LEFT JOIN tt
      ON tt.event_type = ev.event_type AND tt.v <= ev.v
    GROUP BY 1
"""

RELATIONAL["events_type_hour_mi"] = """
    WITH ct AS (
      SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2),
    tot AS (SELECT sum(c) AS n FROM ct),
    mt AS (SELECT t, sum(c) AS ct_t FROM ct GROUP BY 1),
    mh AS (SELECT h, sum(c) AS ct_h FROM ct GROUP BY 1),
    cells AS (
      SELECT mt.t, mh.h, coalesce(ct.c, 0) AS c,
             mt.ct_t * mh.ct_h / (SELECT n FROM tot) AS e
      FROM mt CROSS JOIN mh LEFT JOIN ct USING (t, h)),
    chi AS (SELECT round(sum((c - e) * (c - e) / e), 4) AS chi2,
                   CAST((SELECT count(*) - 1 FROM mt)
                        * (SELECT count(*) - 1 FROM mh) AS BIGINT) AS dof
            FROM cells),
    mi AS (SELECT round(sum(CASE WHEN c > 0
                   THEN c / n * ln(c / e) ELSE 0 END), 4) AS mi
           FROM cells, tot)
    SELECT chi.chi2, chi.dof, mi.mi FROM chi, mi
"""

_EDGES_CTE = f"""
    tr AS (
      SELECT DISTINCT a.norm AS subj, b.norm AS obj,
             a.conv_id, a.turn_idx, a.sent_idx
      FROM {GM} a JOIN {GM} b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.sent_idx = b.sent_idx
      WHERE a.norm <> b.norm),
    ged AS (SELECT subj, obj, count(*) AS weight FROM tr GROUP BY 1, 2),
    gdeg AS (SELECT subj AS norm, count(*) AS degree FROM ged GROUP BY 1)
"""

KG["kg_degree_powerlaw"] = f"""
    WITH {_EDGES_CTE}
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(degree) AS BIGINT) AS d_min,
           CAST(max(degree) AS BIGINT) AS d_max,
           round(1.0 + count(*) / sum(ln(degree * 1.0 / (SELECT min(degree)
                                                         FROM gdeg))), 4)
             AS alpha
    FROM gdeg
"""

KG["kg_rich_club"] = f"""
    WITH {_EDGES_CTE},
    club AS (SELECT norm FROM gdeg WHERE degree > 10),
    nc AS (SELECT count(*) AS n FROM club)
    SELECT CAST(nc.n AS BIGINT) AS n_club,
           CAST((SELECT count(*) FROM ged
                 WHERE subj IN (SELECT norm FROM club)
                   AND obj IN (SELECT norm FROM club)) AS BIGINT) AS e_club,
           round((SELECT count(*) FROM ged
                  WHERE subj IN (SELECT norm FROM club)
                    AND obj IN (SELECT norm FROM club)) * 1.0
                 / (nc.n * (nc.n - 1)), 4) AS phi
    FROM nc
"""

KG["kg_community_conductance"] = f"""
    WITH assign AS ({KG["kg_communities"]}),
    {_EDGES_CTE},
    jj AS (
      SELECT a.community, b.community AS obj_comm, e.weight
      FROM ged e JOIN assign a ON a.norm = e.subj
                 JOIN assign b ON b.norm = e.obj),
    vol AS (SELECT community, sum(weight) AS vol FROM jj GROUP BY 1),
    cut AS (SELECT community, sum(weight) AS cut FROM jj
            WHERE community <> obj_comm GROUP BY 1)
    SELECT v.community, CAST(v.vol AS BIGINT) AS vol,
           CAST(coalesce(c.cut, 0) AS BIGINT) AS cut,
           round(coalesce(c.cut, 0) * 1.0 / v.vol, 4) AS conductance
    FROM vol v LEFT JOIN cut c USING (community)
"""

RELATIONAL["docs_source_vocab_overlap"] = """
    WITH st AS (
      SELECT DISTINCT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS i
      FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, CAST(i AS BIGINT) AS n_common,
           round(i * 1.0 / (na.n + nb.n - i), 4) AS jaccard
    FROM inter
    JOIN sz na ON na.source = src_a
    JOIN sz nb ON nb.source = src_b
"""

RELATIONAL["tpch_q2_min_acctbal_supplier"] = """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    s AS (SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'),
    b AS (SELECT ps.l_partkey, s.s_name, s.s_acctbal, s.n_name
          FROM ps JOIN s ON s.s_suppkey = ps.l_suppkey
          JOIN part ON p_partkey = ps.l_partkey
          WHERE p_size = 25 AND p_type = 'LARGE'),
    m AS (SELECT l_partkey, min(s_acctbal) AS mb FROM b GROUP BY 1)
    SELECT b.s_acctbal, b.s_name, b.n_name,
           b.l_partkey AS p_partkey, p.p_name
    FROM b JOIN m USING (l_partkey) JOIN part p ON p.p_partkey = b.l_partkey
    WHERE b.s_acctbal = m.mb
    ORDER BY s_acctbal, n_name, s_name, p_partkey LIMIT 100
"""

RELATIONAL["tpch_q8_market_share"] = """
    WITH f AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part ON p_partkey = l_partkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'),
    g AS (SELECT o_year,
            round(sum(CASE WHEN supp_nation = 'NATION_3'
                           THEN vol ELSE 0 END), 4) AS nation_volume,
            round(sum(vol), 4) AS total_volume
          FROM f GROUP BY 1)
    SELECT o_year, nation_volume, total_volume,
           round(nation_volume / total_volume, 6) AS mkt_share
    FROM g ORDER BY o_year
"""

RELATIONAL["tpch_q9_nation_profit"] = """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""

RELATIONAL["tpch_q11_important_parts"] = """
    WITH v AS (
      SELECT l_partkey, l_extendedprice * l_quantity AS val
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'),
    g AS (SELECT l_partkey, round(sum(val), 4) AS value FROM v GROUP BY 1)
    SELECT l_partkey, value FROM g
    WHERE value > (SELECT round(sum(value) / count(*), 4) FROM g)
    ORDER BY value DESC, l_partkey
"""

RELATIONAL["tpch_q12_late_lines"] = """
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS lag_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY lag_class
"""

RELATIONAL["tpch_q16_supplier_census"] = """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000))
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

RELATIONAL["tpch_q20_dominant_suppliers"] = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, round(sum(l_quantity), 4) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    pt AS (SELECT l_partkey, round(sum(qty), 4) AS tot FROM ps GROUP BY 1)
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT ps.l_suppkey FROM ps JOIN pt USING (l_partkey)
                        WHERE ps.qty > 0.5 * pt.tot)
    ORDER BY s_name
"""

RELATIONAL["tpch_q21_waiting_suppliers"] = """
    WITH l AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS sd
               FROM lineitem GROUP BY 1, 2),
    f AS (SELECT l.* FROM l JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'),
    o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS nsupp,
                 max(sd) AS omax
          FROM f GROUP BY 1),
    w AS (SELECT f.l_orderkey, f.l_suppkey FROM f JOIN o USING (l_orderkey)
          WHERE o.nsupp >= 2 AND f.sd = o.omax),
    u AS (SELECT l_orderkey FROM w GROUP BY 1 HAVING count(*) = 1)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM w JOIN u USING (l_orderkey) JOIN supplier ON s_suppkey = w.l_suppkey
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100
"""

RELATIONAL["events_rolling_extrema"] = """
    SELECT event_id,
           min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS roll_min,
           max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS roll_max
    FROM events ORDER BY event_id
"""

RELATIONAL["events_value_vs_first"] = """
    SELECT event_id,
           first_value(value) OVER w AS first_value,
           round(value - first_value(value) OVER w, 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
"""

RELATIONAL["events_mode_bucket"] = """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value / 10.0) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n DESC, bucket) AS rn
          FROM c)
    SELECT event_type, bucket AS mode_bucket, n
    FROM r WHERE rn = 1 ORDER BY event_type
"""

RELATIONAL["events_first_last_span"] = """
    SELECT event_id,
           first_value(value) OVER w AS first_value,
           last_value(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_value,
           round(last_value(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             - first_value(value) OVER w, 4) AS span
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
"""

GRZ = f"read_parquet('{SYNTH}/gold_rolling_zscore.parquet')"
RELATIONAL["events_rolling_zscore"] = \
    f"SELECT event_id, roll_mean, roll_std, zscore FROM {GRZ}" \
    " ORDER BY event_id"

RELATIONAL["events_value_deciles"] = """
    SELECT event_id,
           CAST(ntile(10) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS BIGINT)
             AS decile
    FROM events ORDER BY event_id
"""

RELATIONAL["events_user_value_share"] = """
    WITH u AS (
      SELECT event_type, user_id, round(sum(value), 4) AS user_value
      FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, round(sum(value), 4) AS type_value
          FROM events GROUP BY 1)
    SELECT u.event_type, u.user_id, u.user_value, t.type_value,
           round(u.user_value / t.type_value, 6) AS share
    FROM u JOIN t USING (event_type)
    ORDER BY event_type, user_id
"""

RELATIONAL["events_near_pairs"] = """
    SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
    FROM events a JOIN events b ON a.user_id = b.user_id
     AND a.event_type <> b.event_type
     AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 3600000000
     AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
    ORDER BY event_id_a, event_id_b
"""

RELATIONAL["part_discount_corr"] = """
    WITH s AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             sum(l_discount) AS sx, sum(l_quantity) AS sy,
             sum(l_discount * l_discount) AS sxx,
             sum(l_quantity * l_quantity) AS syy,
             sum(l_discount * l_quantity) AS sxy
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand)
    SELECT p_brand, n,
           CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                THEN NULL
                ELSE round((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx)
                                  * (n * syy - sy * sy)), 4) END AS r
    FROM s ORDER BY p_brand
"""

RELATIONAL["events_value_moments"] = """
    WITH s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             sum(value * value * value) AS s3,
             sum(value * value * value * value) AS s4
      FROM events GROUP BY event_type),
    m AS (
      SELECT event_type, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s)
    SELECT event_type, n, round(mu, 4) AS mean,
           CASE WHEN n < 2 THEN NULL
                ELSE round(n * m2 / (n - 1), 4) END AS var_samp,
           CASE WHEN m2 <= 0 THEN NULL
                ELSE round(m3 / (m2 * sqrt(m2)), 4) END AS skewness,
           CASE WHEN m2 <= 0 THEN NULL
                ELSE round(m4 / (m2 * m2) - 3.0, 4) END
             AS kurtosis_excess
    FROM m ORDER BY event_type
"""

RELATIONAL["part_weighted_median_price"] = """
    WITH w AS (
      SELECT p_brand, l_extendedprice AS price, l_quantity AS qty,
             sum(l_quantity) OVER (PARTITION BY p_brand
                                   ORDER BY l_extendedprice) AS cw,
             sum(l_quantity) OVER (PARTITION BY p_brand) AS tot
      FROM lineitem JOIN part ON p_partkey = l_partkey)
    SELECT p_brand, min(price) AS w_median
    FROM w WHERE cw >= 0.5 * tot
    GROUP BY p_brand ORDER BY p_brand
"""

RELATIONAL["orders_monthly_revenue_ma"] = """
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             round(sum(o_totalprice), 4) AS revenue
      FROM orders GROUP BY 1)
    SELECT month, revenue,
           round(avg(revenue) OVER (ORDER BY month
                                    ROWS BETWEEN 2 PRECEDING
                                    AND CURRENT ROW), 4) AS ma3
    FROM m ORDER BY month
"""

RELATIONAL["part_discount_slope"] = """
    WITH s AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             sum(l_discount) AS sx, sum(l_quantity) AS sy,
             sum(l_discount * l_discount) AS sxx,
             sum(l_discount * l_quantity) AS sxy
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand)
    SELECT p_brand, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 4) AS intercept
    FROM s ORDER BY p_brand
"""

RELATIONAL["events_rolling_mean"] = """
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING
                                  AND CURRENT ROW), 4) AS rolling_avg
    FROM events ORDER BY event_id
"""

RELATIONAL["events_zorder_layout"] = """
    WITH b AS (SELECT min(user_id) AS mnx, max(user_id) AS mxx,
                      min(epoch_us(ts)) AS mny, max(epoch_us(ts)) AS mxy
               FROM events),
    q AS (SELECT event_id,
            CASE WHEN mxx = mnx THEN 0
                 ELSE ((user_id - mnx) * 65535) // (mxx - mnx) END AS qx,
            CASE WHEN mxy = mny THEN 0
                 ELSE ((epoch_us(ts) - mny) * 65535) // (mxy - mny) END AS qy
          FROM events, b)
    SELECT event_id,
           CAST(sum((((qx >> i) & 1) << (2 * i))
                  + (((qy >> i) & 1) << (2 * i + 1))) AS BIGINT) AS zkey
    FROM q, generate_series(0, 15) AS t(i)
    GROUP BY event_id ORDER BY event_id
"""

RELATIONAL["events_zorder_skip"] = """
    WITH b AS (SELECT min(user_id) AS mnx, max(user_id) AS mxx,
                      min(epoch_us(ts)) AS mny, max(epoch_us(ts)) AS mxy,
                      min(event_id) AS mni, max(event_id) AS mxi
               FROM events),
    q AS (SELECT event_id, epoch_us(ts) AS tus, user_id AS uid,
            CASE WHEN mxx = mnx THEN 0
                 ELSE ((user_id - mnx) * 65535) // (mxx - mnx) END AS qx,
            CASE WHEN mxy = mny THEN 0
                 ELSE ((epoch_us(ts) - mny) * 65535) // (mxy - mny) END AS qy,
            CASE WHEN mxi = mni THEN 0
                 ELSE ((event_id - mni) * 255) // (mxi - mni) END AS lb
          FROM events, b),
    z AS (SELECT event_id, tus, uid, lb,
            CAST(sum((((qx >> i) & 1) << (2 * i))
                   + (((qy >> i) & 1) << (2 * i + 1))) AS BIGINT) >> 24
              AS zb
          FROM q, generate_series(0, 15) AS t(i)
          GROUP BY event_id, tus, uid, lb),
    zs AS (SELECT zb, min(tus) AS tmn, max(tus) AS tmx,
                  min(uid) AS umn, max(uid) AS umx FROM z GROUP BY zb),
    ls AS (SELECT lb, min(tus) AS tmn, max(tus) AS tmx,
                  min(uid) AS umn, max(uid) AS umx FROM z GROUP BY lb),
    w AS (SELECT epoch_us(TIMESTAMP '2024-01-10') AS t1,
                 epoch_us(TIMESTAMP '2024-01-13') AS t2,
                 mnx + (mxx - mnx) // 10 AS u_hi FROM b)
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM zs) AS n_buckets_z,
      (SELECT CAST(count(*) AS BIGINT) FROM ls) AS n_buckets_linear,
      (SELECT CAST(count(*) AS BIGINT) FROM zs, w
       WHERE tmx < t1 OR tmn >= t2) AS z_time_skipped,
      (SELECT CAST(count(*) AS BIGINT) FROM ls, w
       WHERE tmx < t1 OR tmn >= t2) AS linear_time_skipped,
      (SELECT CAST(count(*) AS BIGINT) FROM zs, w
       WHERE umn > u_hi) AS z_user_skipped,
      (SELECT CAST(count(*) AS BIGINT) FROM ls, w
       WHERE umn > u_hi) AS linear_user_skipped
"""

RELATIONAL["events_range_partition"] = """
    WITH c AS (SELECT quantile_disc(value,
                 [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS cuts
               FROM events)
    SELECT event_id,
           CAST((value > cuts[1])::INT + (value > cuts[2])::INT
              + (value > cuts[3])::INT + (value > cuts[4])::INT
              + (value > cuts[5])::INT + (value > cuts[6])::INT
              + (value > cuts[7])::INT AS BIGINT) AS part
    FROM events, c ORDER BY event_id
"""

RELATIONAL["events_pruned_window"] = """
    SELECT event_id, user_id, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-13'
      AND user_id BETWEEN 0 AND 9
    ORDER BY event_id
"""
