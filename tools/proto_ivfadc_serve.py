#!/usr/bin/env python3
"""Prototype for q_sim_ivfadc_serve: generated clustered corpus (integer
coordinates, md5-60-derived — replayable in both engines), full-corpus
IVFADC index (floor(sqrt(n)) coarse cells, m=16/kSub=32 residual codes),
FIXED nProbe serving so the probed share FALLS with n, exact rerank of
the ADC top-10%. Measures recall@5 vs exact brute force per scale.

Usage: python3 tools/proto_ivfadc_serve.py [nGen ...]
"""
import sys, time
import duckdb

H = "('0x' || substr(md5({}), 1, 15))::BIGINT"


def gen_sql(n_gen: int, n_probe: int, n_q: int) -> str:
    h_center = H.format("'gc:' || (i.i % 64) || ':' || j.j")
    h_jit = H.format("'gj:' || i.i || ':' || j.j")
    return f"""
WITH gen AS MATERIALIZED (
  SELECT i.i AS vec_id,
         list((({h_center}) % 41 - 20) * 2 + (({h_jit}) % 11 - 5)
              ORDER BY j.j)::DOUBLE[] AS v
  FROM generate_series(0, {n_gen} - 1) i(i), generate_series(0, 63) j(j)
  GROUP BY i.i),
e AS MATERIALIZED (SELECT vec_id, v FROM gen),
cq0 AS (SELECT vec_id AS c_id,
          list_transform(v, x -> CAST(floor((x / sqrt(list_dot_product(v, v)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
        FROM e),
nc AS (SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) AS k FROM cq0),
cqq0 AS (SELECT c_id, qx, list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM cq0),
lcent0 AS (SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell,
             qx AS qc
           FROM (SELECT c_id, qx FROM cq0
                 ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id
                 LIMIT (SELECT k FROM nc))),
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
lcent2 AS MATERIALIZED (SELECT c1.cell, COALESCE(u.qc, c1.qc) AS qc
           FROM lcent1 c1 LEFT JOIN lu2 u ON u.cell = c1.cell),
lasgf AS MATERIALIZED (SELECT c_id, coarse, qx FROM (
  SELECT t.c_id, ct.cell AS coarse, t.qx,
         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
  FROM cqq0 t CROSS JOIN lcent2 ct) z WHERE rn = 1),
rs AS MATERIALIZED (SELECT a.c_id, a.coarse,
         list_transform(range(64), i -> a.qx[i+1] - ct.qc[i+1] + 2097152) AS rx
       FROM lasgf a JOIN lcent2 ct ON ct.cell = a.coarse),
seed AS (SELECT cell, rx FROM (
  SELECT CAST(ROW_NUMBER() OVER (
    ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell, rx
  FROM rs) z WHERE cell < 32),
ex0 AS (SELECT c_id, coarse, s.sub, list_slice(rx, s.sub*4 + 1, s.sub*4 + 4) AS sx
        FROM rs CROSS JOIN generate_series(0, 15) s(sub)),
exx0 AS MATERIALIZED (SELECT c_id, coarse, sub, sx, list_dot_product(sx::DOUBLE[], sx::DOUBLE[]) AS sxx FROM ex0),
cb0 AS (SELECT s.sub, cell, list_slice(rx, s.sub*4 + 1, s.sub*4 + 4) AS qc
        FROM seed CROSS JOIN generate_series(0, 15) s(sub)),
a1 AS (SELECT c_id, sub, cell FROM (
  SELECT e0.c_id, e0.sub, cb.cell,
         ROW_NUMBER() OVER (PARTITION BY e0.c_id, e0.sub ORDER BY
           e0.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
             - 2 * list_dot_product(e0.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
  FROM exx0 e0 JOIN cb0 cb ON cb.sub = e0.sub) z WHERE rn = 1),
m1 AS (SELECT a.sub, a.cell, d.d, CAST(SUM(e0.sx[d.d]) // COUNT(*) AS BIGINT) AS vv
       FROM a1 a JOIN exx0 e0 ON e0.c_id = a.c_id AND e0.sub = a.sub
       CROSS JOIN generate_series(1, 4) d(d) GROUP BY a.sub, a.cell, d.d),
u1 AS (SELECT sub, cell, list(vv ORDER BY d) AS qc FROM m1 GROUP BY sub, cell),
cb1 AS (SELECT c0.sub, c0.cell, COALESCE(u.qc, c0.qc) AS qc
        FROM cb0 c0 LEFT JOIN u1 u ON u.sub = c0.sub AND u.cell = c0.cell),
a2 AS (SELECT c_id, sub, cell FROM (
  SELECT e0.c_id, e0.sub, cb.cell,
         ROW_NUMBER() OVER (PARTITION BY e0.c_id, e0.sub ORDER BY
           e0.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
             - 2 * list_dot_product(e0.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
  FROM exx0 e0 JOIN cb1 cb ON cb.sub = e0.sub) z WHERE rn = 1),
m2 AS (SELECT a.sub, a.cell, d.d, CAST(SUM(e0.sx[d.d]) // COUNT(*) AS BIGINT) AS vv
       FROM a2 a JOIN exx0 e0 ON e0.c_id = a.c_id AND e0.sub = a.sub
       CROSS JOIN generate_series(1, 4) d(d) GROUP BY a.sub, a.cell, d.d),
u2 AS (SELECT sub, cell, list(vv ORDER BY d) AS qc FROM m2 GROUP BY sub, cell),
cb2 AS MATERIALIZED (SELECT c1.sub, c1.cell, COALESCE(u.qc, c1.qc) AS qc
        FROM cb1 c1 LEFT JOIN u2 u ON u.sub = c1.sub AND u.cell = c1.cell),
codes AS MATERIALIZED (SELECT c_id, coarse, sub, cell FROM (
  SELECT ea.c_id, ea.coarse, ea.sub, cb.cell,
         ROW_NUMBER() OVER (PARTITION BY ea.c_id, ea.sub ORDER BY
           ea.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
             - 2 * list_dot_product(ea.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
  FROM exx0 ea JOIN cb2 cb ON cb.sub = ea.sub) z WHERE rn = 1),
qn AS (SELECT vec_id AS q_id, qx FROM cq0 JOIN e ON e.vec_id = cq0.c_id WHERE vec_id < {n_q}),
qnn AS (SELECT q_id, qx, list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qqv FROM qn),
probes AS (SELECT q_id, coarse, qx FROM (
  SELECT t.q_id, ct.cell AS coarse, t.qx,
         ROW_NUMBER() OVER (PARTITION BY t.q_id ORDER BY
           t.qqv + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS pr
  FROM qnn t CROSS JOIN lcent2 ct) z WHERE pr <= {n_probe}),
qr AS (SELECT p.q_id, p.coarse,
         list_transform(range(64), i -> p.qx[i+1] - ct.qc[i+1] + 2097152) AS rx
       FROM probes p JOIN lcent2 ct ON ct.cell = p.coarse),
qe AS (SELECT q_id, coarse, s.sub, list_slice(rx, s.sub*4 + 1, s.sub*4 + 4) AS sx
       FROM qr CROSS JOIN generate_series(0, 15) s(sub)),
qex AS (SELECT q_id, coarse, sub, sx, list_dot_product(sx::DOUBLE[], sx::DOUBLE[]) AS sxx FROM qe),
lut AS (SELECT t.q_id, t.coarse, cb.sub, cb.cell,
          t.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
            - 2 * list_dot_product(t.sx::DOUBLE[], cb.qc::DOUBLE[]) AS dd
        FROM qex t JOIN cb2 cb ON cb.sub = t.sub),
adc AS (SELECT l.q_id, cd.c_id, CAST(SUM(l.dd) AS BIGINT) AS adist
        FROM codes cd
        JOIN lut l ON l.coarse = cd.coarse AND l.sub = cd.sub AND l.cell = cd.cell
        GROUP BY l.q_id, cd.c_id),
adccand AS (SELECT q_id, c_id FROM (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rnk
  FROM adc) t
  WHERE rnk <= greatest(5, CAST(ceil(0.10 * (SELECT COUNT(*) FROM e)) AS BIGINT))),
topk AS (SELECT q_id, c_id, rnk, cos FROM (
  SELECT r.q_id, r.c_id,
         list_dot_product(eq.v, ec.v)
           / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY r.q_id
           ORDER BY list_dot_product(eq.v, ec.v)
             / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) DESC, r.c_id) AS BIGINT) AS rnk
  FROM adccand r JOIN e eq ON eq.vec_id = r.q_id JOIN e ec ON ec.vec_id = r.c_id) t
  WHERE rnk <= 5),
exact AS (SELECT q_id, c_id FROM (
  SELECT eq.vec_id AS q_id, ec.vec_id AS c_id,
         ROW_NUMBER() OVER (PARTITION BY eq.vec_id
           ORDER BY list_dot_product(eq.v, ec.v)
             / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) DESC, ec.vec_id) AS rnk
  FROM e eq CROSS JOIN e ec WHERE eq.vec_id < {n_q}) t WHERE rnk <= 5)
SELECT (SELECT COUNT(*) FROM topk t JOIN exact x
          ON x.q_id = t.q_id AND x.c_id = t.c_id)::DOUBLE
         / (SELECT COUNT(*) FROM exact) AS recall,
       (SELECT k FROM nc) AS cells,
       {n_probe}::DOUBLE / (SELECT k FROM nc) AS probed_share,
       (SELECT COUNT(*) FROM codes) AS code_rows
"""


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000]
    for n in sizes:
        t0 = time.time()
        row = duckdb.sql(gen_sql(n, n_probe=8, n_q=50)).fetchone()
        print(f"nGen={n}: recall@5={row[0]:.3f} cells={row[1]} "
              f"share={row[2]:.3f} code_rows={row[3]} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
