#!/usr/bin/env python3
"""Differential-fuzz oracle: independent recomputation of graft's pure
geometry kernels over the seeded WKT corpus, with ALL math in DuckDB SQL
(python only tokenizes the WKT into coordinate rows — the same division of
labor as the committed g92/g104 oracles).

Usage:
  sbt "Test/runMain graft.WktFuzzDump /tmp/wkt_fuzz.txt"
  python3 tools/wkt_fuzz_oracle.py /tmp/wkt_fuzz.txt src/test/resources/wkt_fuzz_expected.csv

The output CSV's first line pins the corpus SHA-256; DifferentialFuzzSpec
regenerates the corpus, matches the hash, and compares every metric at
1e-9 relative tolerance.
"""
import sys, hashlib, re
import duckdb


def parse(path):
    wkts = open(path).read().splitlines()
    sha = hashlib.sha256("\n".join(wkts).encode()).hexdigest()
    rows = []  # (id, kind, part, ring, seq, x, y)
    kinds = []
    for i, w in enumerate(wkts):
        head, body = w.split(" ", 1)
        kind = head.lower()
        kinds.append((i, kind))
        nums = lambda s: [float(t) for t in re.findall(r"-?\d+\.\d+", s)]

        def ring_rows(part, ring, s):
            cs = nums(s)
            for k in range(0, len(cs), 2):
                rows.append((i, kind, part, ring, k // 2, cs[k], cs[k + 1]))

        if kind == "point":
            ring_rows(0, 0, body)
        elif kind == "linestring":
            ring_rows(0, 0, body)
        elif kind == "multipoint":
            for p, m in enumerate(re.findall(r"\(([^()]*)\)", body)):
                ring_rows(p, 0, m)
        elif kind == "polygon":
            for r, m in enumerate(re.findall(r"\(([^()]*)\)", body)):
                ring_rows(0, r, m)
        elif kind == "multipolygon":
            # split on ')), ((' boundaries: parts are '((...), (...))'
            parts = re.findall(r"\(\((?:[^()]|\([^()]*\))*\)\)", body)
            # simpler: each part is a top-level '( ( ... ) [, ( ... )] )'
            if not parts:
                raise ValueError(f"bad multipolygon: {w[:80]}")
            for p, pm in enumerate(parts):
                for r, m in enumerate(re.findall(r"\(([^()]*)\)", pm)):
                    ring_rows(p, r, m)
        else:
            raise ValueError(f"unknown kind {kind}")
    return sha, kinds, rows


SQL = """
WITH segs AS (
  SELECT id, kind, part, ring, x, y,
         LEAD(x) OVER (PARTITION BY id, part, ring ORDER BY seq) AS x2,
         LEAD(y) OVER (PARTITION BY id, part, ring ORDER BY seq) AS y2
  FROM coords
), seglen AS (
  SELECT id, SUM(sqrt((x2-x)*(x2-x) + (y2-y)*(y2-y))) AS len
  FROM segs WHERE x2 IS NOT NULL GROUP BY id
), ringstats AS (
  SELECT id, part, ring,
         0.5 * SUM(x*y2 - x2*y) AS sa,
         SUM((x + x2) * (x*y2 - x2*y)) / 6.0 AS mx,
         SUM((y + y2) * (x*y2 - x2*y)) / 6.0 AS my
  FROM segs WHERE x2 IS NOT NULL AND kind IN ('polygon', 'multipolygon')
  GROUP BY 1, 2, 3
), polyarea AS (
  -- JTS getArea: |shell| - sum(|holes|), summed over parts
  SELECT id, SUM(CASE WHEN ring = 0 THEN abs(sa) ELSE -abs(sa) END) AS area
  FROM ringstats GROUP BY id
), polycent AS (
  -- areal centroid: ring centroid (mx/sa, orientation-free) weighted by
  -- sigma * |A| (shells +, holes -)
  SELECT id,
         SUM(CASE WHEN ring = 0 THEN abs(sa) ELSE -abs(sa) END * (mx / sa))
           / SUM(CASE WHEN ring = 0 THEN abs(sa) ELSE -abs(sa) END) AS cx,
         SUM(CASE WHEN ring = 0 THEN abs(sa) ELSE -abs(sa) END * (my / sa))
           / SUM(CASE WHEN ring = 0 THEN abs(sa) ELSE -abs(sa) END) AS cy
  FROM ringstats GROUP BY id
), linecent AS (
  SELECT id,
         SUM(sqrt((x2-x)*(x2-x)+(y2-y)*(y2-y)) * (x+x2)/2.0)
           / SUM(sqrt((x2-x)*(x2-x)+(y2-y)*(y2-y))) AS cx,
         SUM(sqrt((x2-x)*(x2-x)+(y2-y)*(y2-y)) * (y+y2)/2.0)
           / SUM(sqrt((x2-x)*(x2-x)+(y2-y)*(y2-y))) AS cy
  FROM segs WHERE x2 IS NOT NULL AND kind = 'linestring' GROUP BY id
), pointcent AS (
  SELECT id, AVG(x) AS cx, AVG(y) AS cy FROM coords
  WHERE kind IN ('point', 'multipoint') GROUP BY id
), env AS (
  SELECT id, MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax
  FROM coords GROUP BY id
), hav AS (
  -- R.W. Sinnott 1984 haversine on the IAU sphere, graft's exact steps
  SELECT id, SUM(2.0 * 6371008.8 * asin(least(1.0, sqrt(
           pow(sin(radians(y2 - y) / 2.0), 2)
           + cos(radians(y)) * cos(radians(y2)) * pow(sin(radians(x2 - x) / 2.0), 2)
         )))) AS hav_len
  FROM segs WHERE x2 IS NOT NULL AND kind = 'linestring' GROUP BY id
), ringlists AS (
  SELECT id, part, ring, list(x ORDER BY seq) AS lx, list(y ORDER BY seq) AS ly
  FROM coords WHERE kind IN ('polygon', 'multipolygon') GROUP BY 1, 2, 3
), cdr AS (
  -- Chamberlain-Duquette 2007 ring area, abs per ring (graft ringArea)
  SELECT id, ring,
    abs(list_sum(list_transform(range(0, len(lx) - 1), i ->
      (radians(lx[((i + 2) % (len(lx) - 1)) + 1]) - radians(lx[i + 1]))
      * sin(radians(ly[((i + 1) % (len(lx) - 1)) + 1]))))
      * 6371008.8 * 6371008.8 / 2.0) AS a
  FROM ringlists
), cdarea AS (
  SELECT id, abs(SUM(CASE WHEN ring = 0 THEN a ELSE -a END)) AS sph_area
  FROM cdr GROUP BY id
), tmk AS (
  -- WGS84 Krueger n^6 series constants (same series as the g104 oracle)
  SELECT (1.0/298.257223563) / (2.0 - 1.0/298.257223563) AS tn,
         sqrt((1.0/298.257223563)*(2.0 - 1.0/298.257223563)) AS ea
), tmk2 AS (
  SELECT *,
    6378137.0/(1.0+tn)*(1.0 + tn*tn/4.0 + (tn*tn)*(tn*tn)/64.0
               + (tn*tn)*(tn*tn)*(tn*tn)/256.0) AS biga,
    tn/2.0 - 2.0*tn*tn/3.0 + 5.0*tn*tn*tn/16.0 + 41.0*tn*tn*tn*tn/180.0
      - 127.0*tn*tn*tn*tn*tn/288.0 + 7891.0*tn*tn*tn*tn*tn*tn/37800.0 AS c1,
    13.0*tn*tn/48.0 - 3.0*tn*tn*tn/5.0 + 557.0*tn*tn*tn*tn/1440.0
      + 281.0*tn*tn*tn*tn*tn/630.0 - 1983433.0*tn*tn*tn*tn*tn*tn/1935360.0 AS c2,
    61.0*tn*tn*tn/240.0 - 103.0*tn*tn*tn*tn/140.0 + 15061.0*tn*tn*tn*tn*tn/26880.0
      + 167603.0*tn*tn*tn*tn*tn*tn/181440.0 AS c3,
    49561.0*tn*tn*tn*tn/161280.0 - 179.0*tn*tn*tn*tn*tn/168.0
      + 6601661.0*tn*tn*tn*tn*tn*tn/7257600.0 AS c4,
    34729.0*tn*tn*tn*tn*tn/80640.0 - 3418889.0*tn*tn*tn*tn*tn*tn/1995840.0 AS c5,
    212378941.0*tn*tn*tn*tn*tn*tn/319334400.0 AS c6
  FROM tmk
), probe AS (
  -- the transform probe point is (xmin, ymax): SQL-visible on both sides
  SELECT e.id, e.xmin AS px, e.ymax AS py,
         CAST(FLOOR((e.xmin + 180.0) / 6.0) AS INT) + 1 AS zone,
         (e.ymax < 0) AS south
  FROM env e
), tm0 AS (
  SELECT id, px, py, south,
         radians(px - (-183.0 + 6.0 * zone)) AS dl, sin(radians(py)) AS sf
  FROM probe
), tm1 AS (
  SELECT *, 0.5*ln((1.0+sf)/(1.0-sf)) - ea*0.5*ln((1.0+ea*sf)/(1.0-ea*sf)) AS u
  FROM tm0, tmk2
), tm2 AS (
  SELECT *, (exp(u)-exp(-u))/2.0 AS t FROM tm1
), tm3 AS (
  SELECT *, atan2(t, cos(dl)) AS xip,
         ln(sin(dl)/sqrt(t*t + cos(dl)*cos(dl))
            + sqrt((sin(dl)/sqrt(t*t + cos(dl)*cos(dl)))
                   *(sin(dl)/sqrt(t*t + cos(dl)*cos(dl))) + 1.0)) AS etap
  FROM tm2
), utm AS (
  SELECT id,
    500000.0 + 0.9996 * biga *
      (etap + c1*cos(2.0*xip)*(exp(2.0*etap)-exp(-2.0*etap))/2.0
            + c2*cos(4.0*xip)*(exp(4.0*etap)-exp(-4.0*etap))/2.0
            + c3*cos(6.0*xip)*(exp(6.0*etap)-exp(-6.0*etap))/2.0
            + c4*cos(8.0*xip)*(exp(8.0*etap)-exp(-8.0*etap))/2.0
            + c5*cos(10.0*xip)*(exp(10.0*etap)-exp(-10.0*etap))/2.0
            + c6*cos(12.0*xip)*(exp(12.0*etap)-exp(-12.0*etap))/2.0) AS utm_e,
    (CASE WHEN south THEN 10000000.0 ELSE 0.0 END) + 0.9996 * biga *
      (xip + c1*sin(2.0*xip)*(exp(2.0*etap)+exp(-2.0*etap))/2.0
           + c2*sin(4.0*xip)*(exp(4.0*etap)+exp(-4.0*etap))/2.0
           + c3*sin(6.0*xip)*(exp(6.0*etap)+exp(-6.0*etap))/2.0
           + c4*sin(8.0*xip)*(exp(8.0*etap)+exp(-8.0*etap))/2.0
           + c5*sin(10.0*xip)*(exp(10.0*etap)+exp(-10.0*etap))/2.0
           + c6*sin(12.0*xip)*(exp(12.0*etap)+exp(-12.0*etap))/2.0) AS utm_n
  FROM tm3
), merc AS (
  SELECT id, px / 180.0 * (pi() * 6378137.0) AS merc_x,
         ln(tan((90.0 + py) * pi() / 360.0)) * 6378137.0 AS merc_y
  FROM probe
), rot AS (
  -- JTS rotationInstance(theta, ox, oy) matrix form about the envelope center
  SELECT c.id,
         MIN(cos(th)*c.x - sin(th)*c.y + (ox - ox*cos(th) + oy*sin(th))) AS rot_xmin,
         MIN(sin(th)*c.x + cos(th)*c.y + (oy - ox*sin(th) - oy*cos(th))) AS rot_ymin
  FROM coords c
  JOIN (SELECT id, (xmin+xmax)/2.0 AS ox, (ymin+ymax)/2.0 AS oy,
               CAST(id AS DOUBLE) * 0.1 AS th FROM env) o ON o.id = c.id
  GROUP BY c.id
)
SELECT k.id,
  COALESCE(pa.area, 0.0) AS area,
  COALESCE(CASE WHEN k.kind IN ('polygon','multipolygon') THEN sl.len END, 0.0) AS perim,
  COALESCE(CASE WHEN k.kind IN ('polygon','multipolygon','linestring') THEN sl.len END, 0.0) AS length,
  e.xmin, e.ymin, e.xmax, e.ymax,
  COALESCE(pc.cx, lc.cx, ptc.cx) AS cx,
  COALESCE(pc.cy, lc.cy, ptc.cy) AS cy,
  COALESCE(h.hav_len, 0.0) AS hav_len,
  COALESCE(cda.sph_area, 0.0) AS sph_area,
  m.merc_x, m.merc_y, u.utm_e, u.utm_n, r.rot_xmin, r.rot_ymin
FROM kinds k
JOIN env e ON e.id = k.id
JOIN merc m ON m.id = k.id
JOIN utm u ON u.id = k.id
JOIN rot r ON r.id = k.id
LEFT JOIN polyarea pa ON pa.id = k.id
LEFT JOIN seglen sl ON sl.id = k.id
LEFT JOIN polycent pc ON pc.id = k.id
LEFT JOIN linecent lc ON lc.id = k.id
LEFT JOIN pointcent ptc ON ptc.id = k.id
LEFT JOIN hav h ON h.id = k.id
LEFT JOIN cdarea cda ON cda.id = k.id
ORDER BY k.id
"""


def main(inp, out):
    sha, kinds, rows = parse(inp)
    con = duckdb.connect()
    con.execute("CREATE TABLE kinds (id INT, kind VARCHAR)")
    con.executemany("INSERT INTO kinds VALUES (?, ?)", kinds)
    con.execute("CREATE TABLE coords (id INT, kind VARCHAR, part INT, ring INT, seq INT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO coords VALUES (?, ?, ?, ?, ?, ?, ?)", rows)
    res = con.execute(SQL).fetchall()
    cols = [d[0] for d in con.description]
    with open(out, "w") as f:
        f.write(f"# corpus_sha256={sha}\n")
        f.write(",".join(cols) + "\n")
        for row in res:
            f.write(",".join("%.17g" % v if isinstance(v, float) else str(v) for v in row) + "\n")
    print(f"wrote {len(res)} rows to {out} (corpus sha {sha[:16]}...)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
