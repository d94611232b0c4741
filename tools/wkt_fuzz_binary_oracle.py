#!/usr/bin/env python3
"""Differential-fuzz oracle for BINARY kernels: independent recomputation
of graft's two-argument geometry kernels over PAIRS from the seeded WKT
corpus, all math in DuckDB SQL (python only tokenizes WKT — the same
division of labor as tools/wkt_fuzz_oracle.py).

Pairing: geometry i is paired with the PROBE POINT (xmin, ymax) of
geometry (i + 101) mod N (101 is co-prime with N=1200 and ≡ 5 mod 6, so
every kind meets every kind).

Metrics (id, then):
  pg_dist — planar ST_Distance(probe_j, geom_i): min point-segment
            distance over every segment/vertex, 0 when the probe is
            inside a polygonal geometry (ray-cast parity over all rings —
            holes and disjoint parts compose through parity)
  hav_d   — haversine probe_i → probe_j (Sinnott 1984, IAU sphere)
  and_d   — Andoyer–Lambert ellipsoidal distance, term-by-term
  vin_d   — Vincenty inverse, 20 unrolled iterations, gated to pairs with
            hav_d < 12,000 km (near-antipodal convergence needs unbounded
            iterations; the gate is evaluated identically on both sides)
  az      — planar azimuth probe_i → probe_j (PostGIS convention)
  li_x/y  — ST_LineInterpolatePoint(geom_i, frac_i) for linestrings
            (frac_i = ((i*37) % 97)/100 + 0.01), else 0
  prj_x/y — spherical forward ST_Project(probe_i, 1000·(i+1) m, i·0.05 rad)

Usage:
  sbt "Test/runMain graft.WktFuzzDump /tmp/wkt_fuzz.txt"
  python3 tools/wkt_fuzz_binary_oracle.py /tmp/wkt_fuzz.txt \
      src/test/resources/wkt_fuzz_binary_expected.csv
"""
import sys
import duckdb
from wkt_fuzz_oracle import parse

N = 1200

SQL = """
WITH env AS (
  SELECT id, MIN(x) AS xmin, MAX(y) AS ymax FROM coords GROUP BY id
), pairs AS (
  SELECT e.id, e.xmin AS pxi, e.ymax AS pyi, j.xmin AS pxj, j.ymax AS pyj
  FROM env e JOIN env j ON j.id = (e.id + 101) %% %(N)d
), segs AS (
  SELECT id, kind, part, ring, seq, x, y,
         LEAD(x) OVER (PARTITION BY id, part, ring ORDER BY seq) AS x2,
         LEAD(y) OVER (PARTITION BY id, part, ring ORDER BY seq) AS y2
  FROM coords
), vert AS (
  SELECT c.id, MIN(sqrt((c.x - p.pxj)*(c.x - p.pxj) + (c.y - p.pyj)*(c.y - p.pyj))) AS d
  FROM coords c JOIN pairs p ON p.id = c.id GROUP BY c.id
), segd AS (
  -- point-segment distance: clamp the projection parameter to [0, 1]
  SELECT s.id, MIN(sqrt(
      (p.pxj - (s.x + t*(s.x2 - s.x)))*(p.pxj - (s.x + t*(s.x2 - s.x)))
    + (p.pyj - (s.y + t*(s.y2 - s.y)))*(p.pyj - (s.y + t*(s.y2 - s.y))))) AS d
  FROM (SELECT *,
          CASE WHEN (x2-x)*(x2-x)+(y2-y)*(y2-y) = 0 THEN 0.0
               ELSE greatest(0.0, least(1.0,
                 ((pxj0-x)*(x2-x)+(pyj0-y)*(y2-y)) / ((x2-x)*(x2-x)+(y2-y)*(y2-y))))
          END AS t, pxj0 AS pxj, pyj0 AS pyj
        FROM (SELECT s.*, p.pxj AS pxj0, p.pyj AS pyj0
              FROM segs s JOIN pairs p ON p.id = s.id WHERE s.x2 IS NOT NULL)) s
  JOIN pairs p ON p.id = s.id GROUP BY s.id
), parity AS (
  -- upward ray-cast crossing parity over ALL rings (holes and disjoint
  -- shells compose: inside exactly one shell and no hole -> odd)
  SELECT s.id,
         SUM(CASE WHEN ((s.y > p.pyj) != (s.y2 > p.pyj))
                   AND p.pxj < s.x + (p.pyj - s.y) * (s.x2 - s.x) / (s.y2 - s.y)
             THEN 1 ELSE 0 END) %% 2 AS inside
  FROM segs s JOIN pairs p ON p.id = s.id
  WHERE s.x2 IS NOT NULL AND s.kind IN ('polygon', 'multipolygon')
  GROUP BY s.id
), pg AS (
  SELECT k.id,
    CASE WHEN COALESCE(pa.inside, 0) = 1 THEN 0.0
         ELSE COALESCE(sd.d, v.d) END AS pg_dist
  FROM kinds k
  LEFT JOIN segd sd ON sd.id = k.id
  LEFT JOIN vert v ON v.id = k.id
  LEFT JOIN parity pa ON pa.id = k.id
), geod AS (
  SELECT id, pxi, pyi, pxj, pyj,
    2.0 * 6371008.8 * asin(least(1.0, sqrt(
        pow(sin(radians(pyj - pyi) / 2.0), 2)
        + cos(radians(pyi)) * cos(radians(pyj)) * pow(sin(radians(pxj - pxi) / 2.0), 2)
      ))) AS hav_d
  FROM pairs
), andoyer AS (
  SELECT id, hav_d,
    CASE WHEN s = 0.0 OR c = 0.0 OR omega = 0.0 THEN 0.0
         ELSE 2.0*omega*6378137.0 * (1.0 + (1.0/298.257223563) * (
           ((3.0*sqrt(s*c)/omega - 1.0)/(2.0*c)) * pow(sin(fm),2) * pow(cos(gm),2)
         - ((3.0*sqrt(s*c)/omega + 1.0)/(2.0*s)) * pow(cos(fm),2) * pow(sin(gm),2)))
    END AS and_d
  FROM (SELECT *, CASE WHEN s = 0.0 OR c = 0.0 THEN 0.0 ELSE atan(sqrt(s/c)) END AS omega
        FROM (SELECT id, hav_d, fm, gm,
                pow(sin(gm),2)*pow(cos(lm),2) + pow(cos(fm),2)*pow(sin(lm),2) AS s,
                pow(cos(gm),2)*pow(cos(lm),2) + pow(sin(fm),2)*pow(sin(lm),2) AS c
              FROM (SELECT id, hav_d,
                      (radians(pyi)+radians(pyj))/2.0 AS fm,
                      (radians(pyi)-radians(pyj))/2.0 AS gm,
                      (radians(pxi)-radians(pxj))/2.0 AS lm
                    FROM geod)))
), vbase AS (
  SELECT id, hav_d,
         (pxi = pxj AND pyi = pyj) AS coincident,
         sin(atan((1.0 - 1.0/298.257223563) * tan(radians(pyi)))) AS su1,
         cos(atan((1.0 - 1.0/298.257223563) * tan(radians(pyi)))) AS cu1,
         sin(atan((1.0 - 1.0/298.257223563) * tan(radians(pyj)))) AS su2,
         cos(atan((1.0 - 1.0/298.257223563) * tan(radians(pyj)))) AS cu2,
         radians(pxj - pxi) AS lcap
  FROM geod
), v0 AS (SELECT *, lcap AS lam FROM vbase WHERE hav_d < 12000000.0 AND NOT coincident)
%(viter)s
, vf AS (
  SELECT id,
    bax * (1.0 + usq/16384.0*(4096.0 + usq*(-768.0 + usq*(320.0 - 175.0*usq))))
        * (sig - (usq/1024.0*(256.0 + usq*(-128.0 + usq*(74.0 - 47.0*usq)))) * ss *
           (c2sm + (usq/1024.0*(256.0 + usq*(-128.0 + usq*(74.0 - 47.0*usq))))/4.0 *
            (cs*(-1.0 + 2.0*c2sm*c2sm)
             - (usq/1024.0*(256.0 + usq*(-128.0 + usq*(74.0 - 47.0*usq))))/6.0 * c2sm
               * (-3.0 + 4.0*ss*ss) * (-3.0 + 4.0*c2sm*c2sm)))) AS vin_d
  FROM (
    SELECT id, 6378137.0*(1.0 - 1.0/298.257223563) AS bax,
      c2a * (6378137.0*6378137.0 - pow(6378137.0*(1.0 - 1.0/298.257223563), 2))
          / pow(6378137.0*(1.0 - 1.0/298.257223563), 2) AS usq,
      sig, ss, cs, c2sm
    FROM (
      SELECT id,
        sqrt(pow(cu2*sin(lam),2) + pow(cu1*su2 - su1*cu2*cos(lam),2)) AS ss,
        su1*su2 + cu1*cu2*cos(lam) AS cs,
        atan2(sqrt(pow(cu2*sin(lam),2) + pow(cu1*su2 - su1*cu2*cos(lam),2)),
              su1*su2 + cu1*cu2*cos(lam)) AS sig,
        1.0 - pow(cu1*cu2*sin(lam) / sqrt(pow(cu2*sin(lam),2)
              + pow(cu1*su2 - su1*cu2*cos(lam),2)), 2) AS c2a,
        CASE WHEN 1.0 - pow(cu1*cu2*sin(lam) / sqrt(pow(cu2*sin(lam),2)
                  + pow(cu1*su2 - su1*cu2*cos(lam),2)), 2) = 0.0 THEN 0.0
             ELSE (su1*su2 + cu1*cu2*cos(lam))
                  - 2.0*su1*su2 / (1.0 - pow(cu1*cu2*sin(lam) / sqrt(pow(cu2*sin(lam),2)
                    + pow(cu1*su2 - su1*cu2*cos(lam),2)), 2))
        END AS c2sm
      FROM v20))
), azim AS (
  SELECT id,
    CASE WHEN pxi = pxj AND pyi = pyj THEN 0.0
         WHEN atan2(pxj - pxi, pyj - pyi) < 0.0
           THEN atan2(pxj - pxi, pyj - pyi) + 2.0*pi()
         ELSE atan2(pxj - pxi, pyj - pyi) END AS az
  FROM pairs
), lintgt AS (
  -- cumulative length walk: the point at frac * total along the line
  SELECT id, x, y, x2, y2, seglen,
         SUM(seglen) OVER (PARTITION BY id ORDER BY seq) AS cum,
         SUM(seglen) OVER (PARTITION BY id) AS total,
         ((id*37) %% 97)/100.0 + 0.01 AS frac, seq
  FROM (SELECT id, seq, x, y, x2, y2,
               sqrt((x2-x)*(x2-x) + (y2-y)*(y2-y)) AS seglen
        FROM segs WHERE x2 IS NOT NULL AND kind = 'linestring')
), linpick AS (
  SELECT id, x, y, x2, y2, seglen, cum, total, frac,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq) AS rn
  FROM lintgt WHERE cum >= frac * total
), lin AS (
  SELECT id,
    CASE WHEN seglen = 0.0 THEN x
         ELSE x + (x2 - x) * (1.0 - (cum - frac*total)/seglen) END AS li_x,
    CASE WHEN seglen = 0.0 THEN y
         ELSE y + (y2 - y) * (1.0 - (cum - frac*total)/seglen) END AS li_y
  FROM linpick WHERE rn = 1
), prj AS (
  SELECT id,
    CASE WHEN degrees(radians(pxi) + atan2(sin(azp)*sin(delta)*cos(radians(pyi)),
             cos(delta) - sin(radians(pyi)) * sl2)) > 180.0
         THEN degrees(radians(pxi) + atan2(sin(azp)*sin(delta)*cos(radians(pyi)),
             cos(delta) - sin(radians(pyi)) * sl2)) - 360.0
         WHEN degrees(radians(pxi) + atan2(sin(azp)*sin(delta)*cos(radians(pyi)),
             cos(delta) - sin(radians(pyi)) * sl2)) <= -180.0
         THEN degrees(radians(pxi) + atan2(sin(azp)*sin(delta)*cos(radians(pyi)),
             cos(delta) - sin(radians(pyi)) * sl2)) + 360.0
         ELSE degrees(radians(pxi) + atan2(sin(azp)*sin(delta)*cos(radians(pyi)),
             cos(delta) - sin(radians(pyi)) * sl2))
    END AS prj_x,
    degrees(asin(sl2)) AS prj_y
  FROM (SELECT id, pxi, pyi, azp, delta,
          sin(radians(pyi))*cos(delta) + cos(radians(pyi))*sin(delta)*cos(azp) AS sl2
        FROM (SELECT id, pxi, pyi,
                id * 0.05 AS azp, (1000.0 * (id + 1)) / 6371008.8 AS delta
              FROM pairs))
)
SELECT k.id,
  pg.pg_dist,
  g.hav_d,
  a.and_d,
  COALESCE(vf.vin_d, 0.0) AS vin_d,
  az.az,
  COALESCE(l.li_x, 0.0) AS li_x,
  COALESCE(l.li_y, 0.0) AS li_y,
  p.prj_x, p.prj_y
FROM kinds k
JOIN pg ON pg.id = k.id
JOIN geod g ON g.id = k.id
JOIN andoyer a ON a.id = k.id
LEFT JOIN vf ON vf.id = k.id
JOIN azim az ON az.id = k.id
LEFT JOIN lin l ON l.id = k.id
JOIN prj p ON p.id = k.id
ORDER BY k.id
"""

VITER = """
, v%(k)d AS (
  SELECT * REPLACE (lcap + (1.0 - cc)*(1.0/298.257223563)*sa *
    (sig + cc*ss*(c2sm + cc*cs*(-1.0 + 2.0*c2sm*c2sm))) AS lam)
  FROM (
    SELECT *,
      (1.0/298.257223563)/16.0 * c2a * (4.0 + (1.0/298.257223563)*(4.0 - 3.0*c2a)) AS cc
    FROM (
      SELECT *,
        atan2(ss, cs) AS sig,
        cu1*cu2*sin(lam)/ss AS sa,
        1.0 - pow(cu1*cu2*sin(lam)/ss, 2) AS c2a,
        CASE WHEN 1.0 - pow(cu1*cu2*sin(lam)/ss, 2) = 0.0 THEN 0.0
             ELSE cs - 2.0*su1*su2 / (1.0 - pow(cu1*cu2*sin(lam)/ss, 2)) END AS c2sm
      FROM (
        SELECT id, hav_d, coincident, su1, cu1, su2, cu2, lcap, lam,
          sqrt(pow(cu2*sin(lam),2) + pow(cu1*su2 - su1*cu2*cos(lam),2)) AS ss,
          su1*su2 + cu1*cu2*cos(lam) AS cs
        FROM v%(prev)d)))
)"""


def main(corpus_path, out_path):
    sha, kinds, rows = parse(corpus_path)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE coords (id INT, kind VARCHAR, part INT, ring INT, seq INT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO coords VALUES (?,?,?,?,?,?,?)", rows)
    con.execute("CREATE TABLE kinds (id INT, kind VARCHAR)")
    con.executemany("INSERT INTO kinds VALUES (?,?)", kinds)
    viter = "".join(VITER % {"k": k, "prev": k - 1} for k in range(1, 21))
    sql = SQL % {"N": N, "viter": viter}
    df = con.execute(sql).fetchdf()
    assert len(df) == N, f"expected {N} rows, got {len(df)}"
    cols = ["pg_dist", "hav_d", "and_d", "vin_d", "az", "li_x", "li_y", "prj_x", "prj_y"]
    with open(out_path, "w") as f:
        f.write(f"# corpus_sha256={sha}\n")
        f.write("id," + ",".join(cols) + "\n")
        for _, r in df.iterrows():
            f.write(str(int(r["id"])) + "," +
                    ",".join(repr(float(r[c])) for c in cols) + "\n")
    print(f"wrote {len(df)} rows to {out_path} (corpus {sha[:12]}…)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
