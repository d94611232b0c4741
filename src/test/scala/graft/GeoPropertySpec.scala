package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GeomOps

/** Generator-based properties — an upgrade over the reference, which has no
  * property-based tests (SURVEY.md §5): WKB roundtrip fidelity and the
  * predicate algebra (symmetry, duality, complement) over random geometry.
  * These run on the kernel layer, the exact code Catalyst StaticInvoke
  * expressions call. */
class GeoPropertySpec extends AnyFunSuite {

  private val coord = Gen.chooseNum(-180.0, 180.0)

  private val pointWkb: Gen[Array[Byte]] =
    for (x <- coord; y <- coord) yield GeomOps.point(x, y)

  private val envWkb: Gen[Array[Byte]] =
    for (x0 <- coord; y0 <- coord; w <- Gen.chooseNum(0.1, 50.0); h <- Gen.chooseNum(0.1, 50.0))
      yield GeomOps.makeEnvelope(x0, y0, x0 + w, y0 + h)

  private val lineWkb: Gen[Array[Byte]] =
    for (n <- Gen.chooseNum(2, 12); xs <- Gen.listOfN(n, coord); ys <- Gen.listOfN(n, coord))
      yield GeomOps.write(GeomOps.factory.createLineString(
        xs.zip(ys).map { case (x, y) => new org.locationtech.jts.geom.Coordinate(x, y) }.toArray))

  private val anyGeom: Gen[Array[Byte]] = Gen.oneOf(pointWkb, envWkb, lineWkb)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("WKB roundtrip is identity") {
    check("roundtrip", Prop.forAll(anyGeom) { b =>
      java.util.Arrays.equals(GeomOps.write(GeomOps.read(b)), b)
    })
  }

  test("WKT roundtrip preserves coordinates to printed precision") {
    // WKT is a decimal rendering — roundtrip is exact only to the last
    // printed digit (~1 ulp on 16-significant-digit doubles)
    check("wkt", Prop.forAll(anyGeom) { b =>
      GeomOps.equalsExact(GeomOps.geomFromText(GeomOps.asText(b)), b, 1e-8)
    })
  }

  test("GeoJSON roundtrip is exact") {
    // stronger than equalsTopo (which is undefined-false on degenerate
    // zero-length lines that chooseNum's edge-value biasing can generate):
    // the encoder prints shortest-roundtrip doubles, so coordinates must
    // come back bit-identical
    check("geojson", Prop.forAll(anyGeom) { b =>
      GeomOps.equalsExact(GeomOps.geomFromGeoJson(GeomOps.asGeoJson(b)), b, 0.0)
    })
  }

  test("intersects is symmetric; disjoint is its complement") {
    check("sym", Prop.forAll(anyGeom, anyGeom) { (a, b) =>
      GeomOps.intersects(a, b) == GeomOps.intersects(b, a) &&
      GeomOps.disjoint(a, b) == !GeomOps.intersects(a, b)
    })
  }

  test("contains(a,b) == within(b,a); covers is implied by contains") {
    check("dual", Prop.forAll(envWkb, anyGeom) { (a, b) =>
      val c = GeomOps.contains(a, b)
      c == GeomOps.within(b, a) && (!c || GeomOps.covers(a, b))
    })
  }

  test("distance is symmetric, nonnegative, zero iff intersecting") {
    // forAllNoShrink: the default Array[Byte] shrinker mutates raw WKB into
    // out-of-domain geometries (e.g. POLYGON EMPTY), so a failure report
    // would show inputs the generators can never produce. Symmetry is
    // checked to 2 ulp, not bit-equality: JTS DistanceOp's
    // segmentToSegment evaluates the four point-segment projections in
    // argument order, and two parallel box edges can round the same
    // geometric distance differently per direction (observed 1-ulp gap on
    // chooseNum edge-value boxes).
    check("dist", Prop.forAllNoShrink(anyGeom, anyGeom) { (a, b) =>
      val d = GeomOps.distance(a, b)
      val dba = GeomOps.distance(b, a)
      val ulps = math.abs(
        java.lang.Double.doubleToLongBits(d) - java.lang.Double.doubleToLongBits(dba))
      ulps <= 2 && d >= 0.0 &&
      ((d == 0.0) == GeomOps.intersects(a, b))
    })
  }

  test("envelope contains its geometry; area nonnegative") {
    check("env", Prop.forAll(anyGeom) { b =>
      GeomOps.covers(GeomOps.envelope(b), b) && GeomOps.area(b) >= 0.0
    })
  }

  test("union area >= max component; intersection commutes (topologically)") {
    check("overlay", Prop.forAll(envWkb, envWkb) { (a, b) =>
      val u = GeomOps.area(GeomOps.union(a, b))
      val ia = GeomOps.intersection(a, b)
      val ib = GeomOps.intersection(b, a)
      u >= math.max(GeomOps.area(a), GeomOps.area(b)) - 1e-9 &&
      // JTS equalsTopo is false for two empties — handle disjoint inputs
      ((GeomOps.isEmpty(ia) && GeomOps.isEmpty(ib)) || GeomOps.equalsTopo(ia, ib))
    })
  }

  test("buffer(0) preserves valid polygons; simplify never adds points") {
    check("simplify", Prop.forAll(lineWkb, Gen.chooseNum(0.0, 10.0)) { (l, eps) =>
      GeomOps.nPoints(GeomOps.simplify(l, eps)) <= GeomOps.nPoints(l)
    })
  }

  test("signed area: |signed| == area, reversal flips sign") {
    check("signedArea", Prop.forAll(envWkb) { e =>
      val s = GeomOps.signedArea(e)
      val r = GeomOps.signedArea(GeomOps.reverse(e))
      math.abs(math.abs(s) - GeomOps.area(e)) < 1e-9 && math.abs(s + r) < 1e-9
    })
  }

  test("Karney geodesic vs haversine: within the flattening band") {
    val smallCoord = Gen.chooseNum(-80.0, 80.0) // stay off the poles/antipodes
    check("karney-band", Prop.forAll(smallCoord, smallCoord, smallCoord, smallCoord) {
      (lon1, lat1, lon2, lat2) =>
        val k = graft.core.KarneyGeodesic.distance(lat1, lon1, lat2, lon2)
        val h = graft.core.Geodesy.haversineMeters(lon1, lat1, lon2, lat2)
        // sphere vs ellipsoid differ by at most ~0.56% (flattening + radius choice)
        k >= 0 && (h == 0.0 || math.abs(k - h) / math.max(k, h) < 0.01)
    })
  }

  test("GeoArrow export→decode roundtrip is identity (XY)") {
    import graft.core.GeoArrowOps
    check("ga-roundtrip", Prop.forAll(Gen.oneOf(pointWkb, lineWkb, envWkb)) { b =>
      val g = GeomOps.read(b)
      val back = g.getGeometryType match {
        case "Point" => GeoArrowOps.gaPoint(
          GeoArrowOps.toPoint(b).asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow],
          false, false)
        case "LineString" => GeoArrowOps.gaLineString(GeoArrowOps.toLineString(b), false, false)
        case _ => GeoArrowOps.gaPolygon(GeoArrowOps.toPolygon(b), false, false)
      }
      GeomOps.read(back).equalsExact(g)
    })
  }

  test("kernel matrix never returns silent null (returnNullable=false audit)") {
    // Every ST_* StaticInvoke is built with returnNullable = false: a kernel
    // returning Scala null on non-null input would be silent garbage under
    // codegen. Invoke every scalar-parameter kernel target over adversarial
    // WKB inputs (EMPTY of each type, collapsed/zero-extent shapes, Z/M
    // mixes, nested GC) and require each call to either return non-null or
    // throw — never yield null.
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String

    val adversarial: Seq[Array[Byte]] = Seq(
      "POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
      "MULTIPOINT EMPTY", "MULTILINESTRING EMPTY", "MULTIPOLYGON EMPTY",
      "GEOMETRYCOLLECTION EMPTY",
      "POINT (0 0)", "POINT Z (1 2 3)", "POINT M (1 2 7)", "POINT ZM (1 2 3 4)",
      "LINESTRING (0 0, 0 0)",                       // zero length, repeated point
      "POLYGON ((0 0, 1 1, 1 1, 0 0))",              // collapsed, zero area
      "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))",         // CW shell
      "MULTIPOINT ((0 0))",
      "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
      "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (2 2)))"
    ).map(w => GeomOps.geomFromText(UTF8String.fromString(w)))

    def argFor(dt: DataType, wkb: Array[Byte]): Option[AnyRef] = dt match {
      case BinaryType => Some(wkb)
      case DoubleType => Some(java.lang.Double.valueOf(0.5))
      case IntegerType => Some(java.lang.Integer.valueOf(1))
      case BooleanType => Some(java.lang.Boolean.FALSE)
      case StringType => Some(UTF8String.fromString("T********")) // DE-9IM-shaped
      case _ => None // struct/array/NullType-shaped kernels audited by their own specs
    }

    var invoked = 0
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.functions.GeoFunctions.kernelMatrix.foreach { case (sqlName, cls, method, params, _) =>
      // only audit kernels whose every parameter is scalar-mappable and that
      // actually take a geometry (string-only codecs get a WKT instead)
      if (params.forall(p => argFor(p, adversarial.head).isDefined) &&
          params.contains(BinaryType)) {
        val m = cls.getMethods.find(m => m.getName == method && m.getParameterCount == params.length)
          .getOrElse(fail(s"$sqlName: no method $method/${params.length} on $cls"))
        adversarial.foreach { wkb =>
          val args = params.map(p => argFor(p, wkb).get).toArray
          val res =
            try Some(m.invoke(null, args: _*))
            catch { case _: Throwable => None } // loud failure is acceptable
          res.foreach { r =>
            invoked += 1
            if (r == null) offenders += s"$sqlName ($method) on ${GeomOps.asText(wkb)}"
          }
        }
      }
    }
    assert(invoked > 500, s"audit should exercise the matrix broadly, invoked=$invoked")
    assert(offenders.isEmpty, s"kernels returned silent null:\n${offenders.distinct.mkString("\n")}")
  }

  test("Hilbert clustering: nearby centers map to nearby curve positions on average") {
    import graft.core.Hilbert
    // locality in the contrapositive form that is actually guaranteed:
    // identical cells for identical inputs, monotone grid mapping bounds
    check("hilbert-bounds", Prop.forAll(coord, coord) { (x, y) =>
      val h = Hilbert.ofCenter(x, y, -180, -180, 180, 180)
      h >= 0 && h < (1L << 32) &&
        h == Hilbert.ofCenter(x, y, -180, -180, 180, 180) // deterministic
    })
  }

  test("azimuth: antisymmetry (reverse bearing differs by pi) and range") {
    check("azimuth", Prop.forAll(pointWkb, pointWkb) { (a, b) =>
      val ab = GeomOps.azimuth(a, b)
      val ba = GeomOps.azimuth(b, a)
      if (ab.isNaN) ba.isNaN // coincident points both ways
      else {
        val diff = math.abs(math.abs(ab - ba) - math.Pi)
        ab >= 0.0 && ab < 2 * math.Pi && ba >= 0.0 && ba < 2 * math.Pi &&
          diff < 1e-9
      }
    })
  }

  test("hexBin: deterministic; every point lands in the hex whose center is nearest") {
    val sz = 7.0
    check("hexbin", Prop.forAll(coord, coord) { (x, y) =>
      val bin = GeomOps.hexBin(x, y, sz)
      // decode axial (q, r) from the packed id (q may be negative; the
      // packing is q*2^21 + r with |r| << 2^21, so round-half division
      // recovers q when we decode via the nearer multiple)
      val q = Math.round(bin.toDouble / 2097152.0)
      val r = bin - q * 2097152L
      // flat-top axial -> cartesian center
      val cx = sz * (3.0 / 2.0) * q
      val cy = sz * (math.sqrt(3.0) / 2.0 * q + math.sqrt(3.0) * r)
      val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
      // center of the assigned hex is within the hex circumradius (size)
      // of the point, up to cube-rounding boundary slack
      bin == GeomOps.hexBin(x, y, sz) && d2 <= (sz * 1.5) * (sz * 1.5)
    })
  }

  test("prepared-geometry cache: every predicate agrees with direct JTS on both hot sides") {
    // The round-11 predicate cache promotes a repeating operand to a JTS
    // PreparedGeometry — and the prepared ops take the prepared side as the
    // LEFT receiver, so the non-commutative predicates route through
    // hand-mapped swaps (contains(a,b) ⇔ prepared(b).within(a), covers ⇔
    // coveredBy, …). A wrong swap only shows when the SWAPPED side is the
    // hot one, which g76 doesn't cover for within/covers/coveredBy/crosses.
    // This hammers each predicate 8× per operand role (past the promotion
    // threshold) on random geometry pairs and pins every call to the
    // direct unprepared JTS answer.
    val preds: Seq[(String, (Array[Byte], Array[Byte]) => Boolean,
                    (org.locationtech.jts.geom.Geometry, org.locationtech.jts.geom.Geometry) => Boolean)] = Seq(
      ("intersects", GeomOps.intersects, _ intersects _),
      ("contains", GeomOps.contains, _ contains _),
      ("within", GeomOps.within, _ within _),
      ("covers", GeomOps.covers, _ covers _),
      ("coveredBy", GeomOps.coveredBy, _ coveredBy _),
      ("crosses", GeomOps.crosses, _ crosses _),
      ("touches", GeomOps.touches, _ touches _),
      ("overlaps", GeomOps.overlaps, _ overlaps _),
      ("disjoint", GeomOps.disjoint, _ disjoint _))
    check("predCache", Prop.forAll(anyGeom, anyGeom) { (a, b) =>
      preds.forall { case (name, cached, direct) =>
        // role 1: `a` hot (same bytes 8×) against VARYING b translates —
        // the cache is content-keyed, so only content variation keeps the
        // cold side's hit count at 0 and forces the hot side's prepared
        // path; role 2 mirrors with `b` hot.
        val hotA = (0 until 8).forall { i =>
          val bi = GeomOps.translate(b, 0.0011 * i, 0.0007 * i)
          cached(a, bi) == direct(GeomOps.read(a), GeomOps.read(bi))
        }
        val hotB = (0 until 8).forall { i =>
          val ai = GeomOps.translate(a, 0.0011 * i, 0.0007 * i)
          cached(ai, b) == direct(GeomOps.read(ai), GeomOps.read(b))
        }
        if (!(hotA && hotB))
          println(s"predCache mismatch: $name a=${GeomOps.read(a)} b=${GeomOps.read(b)}")
        hotA && hotB
      }
    })
  }

  test("predicate cache: retained WKB bytes stay under the per-thread budget") {
    // Round-12 advice fix: the cache is byte-budgeted as well as
    // entry-capped. Stream >2× the budget of distinct ~512 KB operands
    // through a predicate on one thread and assert the retained-bytes gauge
    // never exceeds the budget — a pure entry cap (256 × 1 MB) would blow
    // ~8× past it. Distinct content per operand defeats the content-keyed
    // dedup; the big ring keeps each WKB near the 1 MB per-entry cap.
    val t = new Thread(() => {
      val n = 80 // 80 × ~512 KB ≈ 40 MB streamed vs a 16 MB budget
      val probe = GeomOps.point(0.5, 0.5)
      (0 until n).foreach { i =>
        // ~16k-vertex ring, unique per i → ~512 KB WKB each
        val pts = 16384
        val coords = (0 to pts).map { j =>
          val ang = 2 * math.Pi * j / pts
          new org.locationtech.jts.geom.Coordinate(
            math.cos(ang) * (10 + i * 0.001), math.sin(ang) * (10 + i * 0.001))
        }.toArray
        coords(pts) = coords(0)
        val poly = GeomOps.write(GeomOps.factory.createPolygon(coords))
        assert(poly.length < GeomOps.PredCacheMaxBytes / 8, "fixture under per-entry cap")
        GeomOps.contains(poly, probe)
        assert(GeomOps.predCacheRetainedBytes <= GeomOps.PredCacheMaxBytes,
          s"retained ${GeomOps.predCacheRetainedBytes} > budget after insert $i")
      }
      assert(GeomOps.predCacheRetainedBytes > 0, "cache did retain something")
    })
    var err: Throwable = null
    t.setUncaughtExceptionHandler((_, e) => err = e)
    t.start(); t.join()
    if (err != null) throw err
  }
}
