#!/usr/bin/env python3
"""Probe-ceiling measurement for the IVF-PQ coarse geometry (round 18).

Replays the exact-integer Lloyd recipe (hash seeds, 2 iterations, floor
means) in DuckDB on the seed slice (%3==0), assigns ALL docs under the
final centroids, probes each query's nProbe nearest cells, and reports
ceiling = |exact top-5 inside probed cells| / |exact top-5| -- the hard
recall cap no encoding (raw or residual) can beat. Grid over (nCells,
nProbe) x SFs."""
import sys
import duckdb

LLOYD = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM '{path}'),
cq0 AS (SELECT vec_id AS c_id,
          list_transform(v, x -> CAST(floor((x / sqrt(list_dot_product(v, v)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
        FROM e WHERE vec_id % 3 = 0),
cqq0 AS (SELECT c_id, qx, list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM cq0),
lcent0 AS (SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell,
             qx AS qc
           FROM (SELECT c_id, qx FROM cq0
                 ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id
                 LIMIT {ncells})),
lasg1 AS (SELECT c_id, cell, qx FROM (
  SELECT t.c_id, ct.cell, t.qx,
         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
  FROM cqq0 t CROSS JOIN lcent0 ct) z WHERE rn = 1),
lm1 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
        FROM lasg1 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
lu1 AS (SELECT cell, list(s ORDER BY d) AS qc FROM lm1 GROUP BY cell),
lcent1 AS (SELECT c0.cell, COALESCE(u.qc, c0.qc) AS qc
           FROM lcent0 c0 LEFT JOIN lu1 u ON u.cell = c0.cell),
lasg2 AS (SELECT c_id, cell, qx FROM (
  SELECT t.c_id, ct.cell, t.qx,
         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
  FROM cqq0 t CROSS JOIN lcent1 ct) z WHERE rn = 1),
lm2 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
        FROM lasg2 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
lu2 AS (SELECT cell, list(s ORDER BY d) AS qc FROM lm2 GROUP BY cell),
lcent2 AS (SELECT c1.cell, COALESCE(u.qc, c1.qc) AS qc
           FROM lcent1 c1 LEFT JOIN lu2 u ON u.cell = c1.cell),
cqa AS (SELECT vec_id AS c_id,
          list_transform(v, x -> CAST(floor((x / sqrt(list_dot_product(v, v)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
        FROM e),
cqaq AS (SELECT c_id, qx, list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM cqa),
lasgf AS (SELECT c_id, coarse FROM (
  SELECT t.c_id, ct.cell AS coarse,
         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
  FROM cqaq t CROSS JOIN lcent2 ct) z WHERE rn = 1),
qnn AS (SELECT c_id AS q_id, qx, qq FROM cqaq WHERE c_id < 100),
probes AS (SELECT q_id, coarse FROM (
  SELECT t.q_id, ct.cell AS coarse,
         ROW_NUMBER() OVER (PARTITION BY t.q_id ORDER BY
           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS pr
  FROM qnn t CROSS JOIN lcent2 ct) z WHERE pr <= {nprobe}),
exact AS (SELECT q_id, c_id FROM (
  SELECT eq.vec_id AS q_id, ec.vec_id AS c_id,
         ROW_NUMBER() OVER (PARTITION BY eq.vec_id
           ORDER BY list_dot_product(eq.v, ec.v)
             / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) DESC, ec.vec_id) AS rnk
  FROM e eq CROSS JOIN e ec WHERE eq.vec_id < 100) t WHERE rnk <= 5),
hit AS (SELECT x.q_id, x.c_id FROM exact x
        JOIN lasgf a ON a.c_id = x.c_id
        JOIN probes p ON p.q_id = x.q_id AND p.coarse = a.coarse),
share AS (SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM cqa) AS row_share
          FROM probes p JOIN lasgf a ON a.coarse = p.coarse)
SELECT (SELECT COUNT(*) FROM hit) * 1.0 / (SELECT COUNT(*) FROM exact) AS ceiling,
       (SELECT row_share / (SELECT COUNT(*) FROM qnn) FROM share) AS row_share
"""

sfs = sys.argv[1].split(",") if len(sys.argv) > 1 else ["0.001", "0.01", "0.1"]
grid = sys.argv[2] if len(sys.argv) > 2 else "auto"
for sf in sfs:
    path = f"/root/testdata/sf{sf}/embeddings.parquet"
    n_seed = duckdb.sql(
        f"SELECT COUNT(*) FROM '{path}' WHERE vec_id % 3 = 0").fetchone()[0]
    import math
    autocells = int(math.isqrt(n_seed))
    cells_list = ([autocells, 16] if grid == "auto" else
                  [int(x) for x in grid.split(";")[0].split()])
    for nc in cells_list:
        for share in (0.25, 0.375, 0.5, 0.625):
            np_ = max(1, math.ceil(nc * share))
            q = LLOYD.format(path=path, ncells=nc, nprobe=np_)
            ceiling, row_share = duckdb.sql(q).fetchone()
            print(f"sf{sf} nCells={nc} nProbe={np_} cellShare={np_/nc:.3f} "
                  f"rowShare={row_share:.3f} ceiling={ceiling:.3f}", flush=True)
