-- Spectral-core oracle: recomputes the full taumode pipeline from the
-- embeddings table in pure SQL (DuckDB), mirroring
-- FeatureLaplacian.build + LocalLaplacian.synth + TauMode.Median with
-- GraphParams(eps=1.0, k=10, topk=10, p=2.0, sigma=0.5).
WITH x AS (
  SELECT vec_id AS id,
         generate_subscripts(embedding, 1) AS f,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
gram AS (
  SELECT a.f AS f, b.f AS g, sum(a.v * b.v) AS m
  FROM x a JOIN x b ON a.id = b.id AND a.f <= b.f
  GROUP BY a.f, b.f
),
diag AS (SELECT f, m FROM gram WHERE f = g),
edges AS (
  SELECT gr.f, gr.g,
         1.0 / (1.0 + pow((1.0 - greatest(0.0,
             CASE WHEN da.m * db.m <= 0 THEN 0.0
                  ELSE gr.m / sqrt(da.m * db.m) END)) / 0.5, 2.0)) AS w
  FROM gram gr
  JOIN diag da ON da.f = gr.f
  JOIN diag db ON db.f = gr.g
  WHERE gr.f < gr.g
),
contrib AS (
  SELECT xa.id, e.w * (xa.v - xb.v) * (xa.v - xb.v) AS c
  FROM edges e
  JOIN x xa ON xa.f = e.f
  JOIN x xb ON xb.id = xa.id AND xb.f = e.g
),
energy AS (
  SELECT id, sum(c) AS e_raw,
         CASE WHEN sum(c) <= 0 THEN 0.0
              ELSE least(1.0, greatest(0.0, sum(c * c) / (sum(c) * sum(c)))) END AS gini
  FROM contrib GROUP BY id
),
tau AS (SELECT quantile_disc(e_raw, 0.5) AS t FROM energy),
lam AS (
  SELECT en.id,
         (t.t / (1.0 + t.t)) *
           (CASE WHEN en.e_raw + t.t = 0 THEN 0.0
                 ELSE en.e_raw / (en.e_raw + t.t) END) +
         (1.0 - t.t / (1.0 + t.t)) * en.gini AS lambda,
         en.e_raw AS e_raw
  FROM energy en CROSS JOIN tau t
)
SELECT id, round(lambda, 6) AS lambda FROM lam ORDER BY id
