package graft

import org.apache.spark.sql.functions._

import graft.functions.{Geo, GraftFunctions => GF}
import graft.ops.RelOps

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("ExtractInts expression == built-in composition, both match PG semantics") {
    // the last three: >2^31 run, >10^19 run (would overflow even a long
    // cast under ANSI), long leading-zero run — all dropped, never thrown
    val df = Seq("50 mph", "80 km/h", "1-URGENT", "no digits", "", "12;34 56",
      "007", "2000000000x1", "4294967296", "99999999999999999999 ok 3",
      "0000000000000000007").toDF("s")
    val r = df.select(GF.extractInts($"s").as("a"), GF.extractIntsBuiltin($"s").as("b"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[Int](0) === row.getSeq[Int](1),
        s"expression vs builtin mismatch on ${row}")
    }
    val byInput = df.select($"s", GF.extractInts($"s").as("a")).collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(byInput("50 mph") === List(50))
    assert(byInput("80 km/h") === List(80))
    assert(byInput("1-URGENT") === List(1))
    assert(byInput("no digits") === Nil)
    assert(byInput("") === Nil)
    assert(byInput("12;34 56") === List(12, 34, 56))
    assert(byInput("007") === List(7))
    assert(byInput("4294967296") === Nil)
    assert(byInput("99999999999999999999 ok 3") === List(3))
    assert(byInput("0000000000000000007") === List(7))
  }

  test("ExtractInts via SQL (injected function) and null propagation") {
    val r = spark.sql(
      "SELECT get_ints_from_text('maxspeed is 30, was 40'), get_ints_from_text(NULL)")
      .head()
    assert(r.getSeq[Int](0).toList === List(30, 40))
    assert(r.isNullAt(1))
  }

  test("NfcNormalize: composes decomposed forms, identity on NFC text, null propagation") {
    // "cafe" + combining acute (U+0301) -> composed "caf\u00e9":
    // 5 codepoints in, 4 out, equal to the composed literal
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed'), length(nfc_normalize('$decomposed')), " +
        "nfc_normalize('already plain ascii'), nfc_normalize(NULL), " +
        s"nfc_normalize('$decomposed') = '$composed'")
      .head()
    assert(r.getString(0) === composed)
    assert(r.getInt(1) === 4)
    assert(r.getString(2) === "already plain ascii")
    assert(r.isNullAt(3))
    assert(r.getBoolean(4), "normalized-decomposed must equal the composed literal")
    // the dedup consequence: both forms hash identically after NFC
    val hashes = spark.sql(
      s"SELECT md5(nfc_normalize('$decomposed')), md5(nfc_normalize('$composed'))").head()
    assert(hashes.getString(0) === hashes.getString(1))
    // peephole: defensive double-normalization collapses to one call
    // (non-foldable input, else ConstantFolding would erase the evidence)
    val optimized = spark.range(1)
      .selectExpr("nfc_normalize(nfc_normalize(CAST(id AS STRING))) AS n")
      .queryExecution.optimizedPlan.toString
    assert("nfc_normalize".r.findAllIn(optimized).length === 1,
      s"idempotence rule should collapse nested calls:\n$optimized")
  }

  test("haversine: known distance (Paris-London ~343.5 km)") {
    val d = spark.range(1).select(
      Geo.haversineMeters(lit(2.3522), lit(48.8566), lit(-0.1276), lit(51.5074)))
      .head.getDouble(0)
    assert(math.abs(d / 1000 - 343.5) < 1.0)
  }

  test("geodesicLengthMeters: degenerate lines and additivity") {
    val df = Seq(
      (1, Seq((0.0, 0.0))),                       // single point -> 0
      (2, Seq.empty[(Double, Double)]),           // empty -> 0
      (3, Seq((0.0, 0.0), (0.01, 0.0), (0.02, 0.0)))).toDF("id", "raw")
      .select($"id", transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
    val r = df.select($"id", Geo.geodesicLengthMeters($"line")).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(1) === 0.0 && r(2) === 0.0)
    assert(math.abs(r(3) - 2223.9) < 1.0)
  }

  test("EPSG:3347 LCC projection: false origin, and planar vs geodesic length") {
    // the CRS's false origin must project to exactly (FE, FN) — the
    // published EPSG anchor for the whole parameter set
    val origin = spark.range(1).select(Geo.lccProject(
        struct(lit(-91.86666666666667).as("lon"), lit(63.390675).as("lat"))))
      .head.getStruct(0)
    assert(math.abs(origin.getDouble(0) - 6200000.0) < 1e-6)
    assert(math.abs(origin.getDouble(1) - 3000000.0) < 1e-6)
    // on the first standard parallel (scale factor 1 by construction),
    // planar meters must agree with geodesic meters to well under 1%:
    // one degree of longitude along lat 49 near the central meridian
    val line = Seq(Seq((-92.0, 49.0), (-91.0, 49.0))).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
    val (planar, geodesic) = line.select(
        Geo.planarLengthMeters($"line"), Geo.geodesicLengthMeters($"line"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1))).head
    assert(planar > 60000 && planar < 80000)          // ~73 km sanity
    assert(math.abs(planar - geodesic) / geodesic < 0.005)
    // mid-cone (lat 63, between the 49/77 standard parallels) the LCC
    // scale factor dips below 1: planar reads ~2.7% SHORT of geodesic —
    // that's the projection's real distortion profile, not an error
    // (conformal conics are exact only on their standard parallels)
    val line2 = Seq(Seq((-92.0, 63.0), (-91.0, 63.0))).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
    val (p2, g2) = line2.select(
        Geo.planarLengthMeters($"line"), Geo.geodesicLengthMeters($"line"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1))).head
    assert(p2 < g2 && math.abs(p2 - g2) / g2 < 0.04)
  }

  test("ST_Transform family: UTM anchors, Web Mercator round-trip, dispatcher") {
    def pt(lon: Double, lat: Double) =
      struct(lit(lon).as("lon"), lit(lat).as("lat"))
    // UTM zone 33N central-meridian anchors: easting is exactly FE on
    // the meridian; the equator projects to northing 0 (lat0 = 0)
    val cm = spark.range(1).select(
        Geo.stTransform(pt(15.0, 50.0), 32633).as("a"),
        Geo.stTransform(pt(15.0, 0.0), 32633).as("b"),
        Geo.stTransform(pt(15.0, -50.0), 32733).as("c"))
      .head()
    assert(math.abs(cm.getStruct(0).getDouble(0) - 500000.0) < 1e-6)
    assert(math.abs(cm.getStruct(1).getDouble(0) - 500000.0) < 1e-6)
    assert(math.abs(cm.getStruct(1).getDouble(1)) < 1e-6)
    // south zone: FN 10 000 km, hemispheric symmetry — 50°S in 33S
    // sits as far below FN as 50°N sits above 0
    val n50 = cm.getStruct(0).getDouble(1)
    assert(math.abs((10000000.0 - cm.getStruct(2).getDouble(1)) - n50) < 1e-3)
    // UTM scale sanity: 1° of longitude at lat 50 along the zone —
    // planar vs spherical-haversine agree to ~0.3% (the ellipsoid's
    // parallel radius at 50° differs from the mean sphere by that
    // much; same 0.5% band the LCC test uses)
    val seg = spark.range(1).select(
        Geo.stTransform(pt(14.5, 50.0), 32633).as("p"),
        Geo.stTransform(pt(15.5, 50.0), 32633).as("q")).head()
    val dx = seg.getStruct(1).getDouble(0) - seg.getStruct(0).getDouble(0)
    val dy = seg.getStruct(1).getDouble(1) - seg.getStruct(0).getDouble(1)
    val planar = math.sqrt(dx * dx + dy * dy)
    val geod = spark.range(1).select(Geo.haversineMeters(
      lit(14.5), lit(50.0), lit(15.5), lit(50.0))).head().getDouble(0)
    assert(math.abs(planar - geod) / geod < 0.005, s"$planar vs $geod")
    // Web Mercator: published anchor y(85.05113°) == x(180°) (the
    // square tile pyramid), and inverse is an exact round-trip
    val wm = spark.range(1).select(
        Geo.webMercator(pt(180.0, 85.05112877980659)).as("m"),
        Geo.webMercatorInverse(
          Geo.webMercator(pt(13.4, 52.52))).as("rt"))
      .head()
    assert(math.abs(wm.getStruct(0).getDouble(0) -
      wm.getStruct(0).getDouble(1)) < 1e-3)
    assert(math.abs(wm.getStruct(1).getDouble(0) - 13.4) < 1e-9)
    assert(math.abs(wm.getStruct(1).getDouble(1) - 52.52) < 1e-9)
    // dispatcher: 4326 is identity-as-xy; unsupported SRID fails at
    // plan time
    val id4326 = spark.range(1)
      .select(Geo.stTransform(pt(1.5, -2.5), 4326)).head().getStruct(0)
    assert(id4326.getDouble(0) === 1.5 && id4326.getDouble(1) === -2.5)
    intercept[IllegalArgumentException] { Geo.stTransform(pt(0, 0), 2154) }
  }

  test("inverse projections round-trip forward to <1e-8 degrees (UTM, LCC, 3857)") {
    // 1e-8 deg =~ 1.1 mm — the documented accuracy of the Snyder
    // forward/inverse series pair inside a zone (measured worst
    // residual 3.3e-9 deg at lat 52.5)
    def pt(lon: Double, lat: Double) =
      struct(lit(lon).as("lon"), lit(lat).as("lat"))
    val probes = Seq( // (srid, lon, lat) across hemispheres and zones
      (32633, 13.4, 52.52), (32633, 17.9, 40.1), (32633, 12.1, 64.9),
      (32733, 16.0, -33.9), (32618, -74.0, 40.7),
      (3347, -91.8, 63.4), (3347, -75.7, 45.4), (3347, -123.1, 49.3),
      (3857, 139.7, 35.7), (3857, -58.4, -34.6))
    probes.foreach { case (srid, lon, lat) =>
      val rt = spark.range(1).select(
          Geo.stTransformInverse(
            Geo.stTransform(pt(lon, lat), srid), srid))
        .head().getStruct(0)
      assert(math.abs(rt.getDouble(0) - lon) < 1e-8,
        s"srid $srid lon: ${rt.getDouble(0)} vs $lon")
      assert(math.abs(rt.getDouble(1) - lat) < 1e-8,
        s"srid $srid lat: ${rt.getDouble(1)} vs $lat")
    }
  }

  test("distanceJoin == brute force on random point sets; extentAgg bbox") {
    val rnd = new scala.util.Random(7L)
    def pts(n: Int, off: Long) = (1 to n).map(i =>
      (off + i, rnd.nextDouble() * 0.5, rnd.nextDouble() * 0.5))
    val a = pts(120, 1000).toDF("aid", "lon", "lat")
      .select($"aid", struct($"lon", $"lat").as("p"))
    val b = pts(80, 2000).toDF("bid", "lon", "lat")
      .select($"bid", struct($"lon", $"lat").as("p"))
    val maxM = 3000.0
    val grid = Geo.distanceJoin(a, "aid", $"p", b, "bid", $"p",
        maxM, cellDeg = 0.03)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = a.crossJoin(b.select($"bid", $"p".as("q")))
      .withColumn("d", Geo.haversineMeters(
        $"p.lon", $"p.lat", $"q.lon", $"q.lat"))
      .filter($"d" <= maxM).select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid === brute && grid.nonEmpty,
      s"grid ${grid.size} pairs vs brute ${brute.size}")
    // extent aggregate covers every point
    val ext = a.agg(Geo.extentAgg($"p").as("e")).select("e.*").head()
    assert(ext.getDouble(0) <= ext.getDouble(2) &&
      ext.getDouble(1) <= ext.getDouble(3))
    assert(ext.getDouble(0) >= 0.0 && ext.getDouble(2) <= 0.5)
  }

  test("nearestJoin == brute-force argmin on random point sets") {
    val rnd = new scala.util.Random(11L)
    def pts(n: Int, off: Long) = (1 to n).map(i =>
      (off + i, rnd.nextDouble() * 0.5, rnd.nextDouble() * 0.5))
    val q = pts(150, 1000).toDF("qid", "lon", "lat")
      .select($"qid", struct($"lon", $"lat").as("p"))
    val t = pts(60, 2000).toDF("tid", "lon", "lat")
      .select($"tid", struct($"lon", $"lat").as("p"))
    val maxM = 5000.0
    val grid = Geo.nearestJoin(q, "qid", $"p", t, "tid", $"p",
        maxM, cellDeg = 0.05)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val brute = q.crossJoin(t.select($"tid", $"p".as("u")))
      .withColumn("d", Geo.haversineMeters(
        $"p.lon", $"p.lat", $"u.lon", $"u.lat"))
      .filter($"d" <= maxM).select("qid", "tid", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (qid, cs) =>
        val best = cs.minBy(c => (c._3, c._2)); qid -> (best._2, best._3) }
    assert(grid === brute && grid.nonEmpty, s"${grid.size} vs ${brute.size}")
    // a query with no target in range is absent, not null
    val far = Seq((9001L, 30.0, 30.0)).toDF("qid", "lon", "lat")
      .select($"qid", struct($"lon", $"lat").as("p"))
    assert(Geo.nearestJoin(far, "qid", $"p", t, "tid", $"p",
      maxM, cellDeg = 0.05).isEmpty)
  }

  test("simplifyLine: DP invariants on random lines; exact staircase; edges") {
    import graft.functions.GraftFunctions.simplifyLine
    // exact: collinear fillers on a triangle wave drop, corners stay
    val wave = (0 to 24).map(x => (x.toDouble, (4 - math.abs(x % 8 - 4)).toDouble))
    val df = Seq(Tuple1(wave)).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
    val got = df.select(simplifyLine($"line", 0.5).as("s")).head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got === (0 to 24).filter(_ % 4 == 0)
      .map(x => (x.toDouble, (4 - math.abs(x % 8 - 4)).toDouble)))
    // flat line collapses to endpoints; n<=2 passes through
    val flat = (0 to 9).map(x => (x.toDouble, 0.0))
    val gotFlat = Seq(Tuple1(flat)).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
      .select(simplifyLine($"line", 0.5).as("s")).head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(gotFlat.map(_.getDouble(0)) === Seq(0.0, 9.0))
    // deviation exactly eps is dropped (strictly-greater keeps)
    val atEps = Seq(Tuple1(Seq((0.0, 0.0), (1.0, 0.5), (2.0, 0.0)))).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
      .select(simplifyLine($"line", 0.5).as("s")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(atEps.size === 2)
    // random lines: output is a subsequence incl. endpoints, and every
    // input vertex is within eps of the simplified polyline
    val rnd = new scala.util.Random(5L)
    val eps = 0.3
    (1 to 20).foreach { _ =>
      val n = 3 + rnd.nextInt(40)
      val pts = (1 to n).map(i => (i * 1.0 + rnd.nextDouble(),
        rnd.nextDouble() * 4.0))
      val s = Seq(Tuple1(pts)).toDF("raw")
        .select(transform($"raw",
          p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
        .select(simplifyLine($"line", eps).as("s")).head()
        .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getDouble(1)))
      assert(s.head === pts.head && s.last === pts.last)
      // subsequence check
      var pi = 0
      s.foreach { v => pi = pts.indexOf(v, pi); assert(pi >= 0); pi += 1 }
      // DP guarantee: dropped vertices lie within eps of the output line
      def seg(p: (Double, Double), a: (Double, Double), b: (Double, Double)) = {
        val dx = b._1 - a._1; val dy = b._2 - a._2
        val l2 = dx * dx + dy * dy
        val t = if (l2 == 0) 0.0
          else math.max(0.0, math.min(1.0,
            ((p._1 - a._1) * dx + (p._2 - a._2) * dy) / l2))
        math.hypot(p._1 - (a._1 + t * dx), p._2 - (a._2 + t * dy))
      }
      pts.foreach { p =>
        val d = s.sliding(2).map(w => seg(p, w(0), w(1))).min
        assert(d <= eps + 1e-12, s"vertex $p is $d from simplified line")
      }
    }
  }

  test("closestPointOnLine + nearestEdgeJoin == brute force") {
    import graft.functions.GraftFunctions.closestPointOnLine
    // hand-checked: point above the middle of a horizontal segment
    val one = Seq(Tuple1(Seq((0.0, 0.0), (10.0, 0.0)))).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
      .select(closestPointOnLine($"line", lit(3.0), lit(4.0)).as("c"))
      .select("c.*").head()
    assert(one.getDouble(0) === 16.0 && one.getDouble(1) === 3.0 &&
      one.getDouble(2) === 0.0)
    // empty line: infinite distance (codegen-safe sentinel, never null)
    val emptyLine = Seq(Tuple1(Seq.empty[(Double, Double)])).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
      .select(closestPointOnLine($"line", lit(0.0), lit(0.0)).as("c"))
      .select("c.*").head()
    assert(emptyLine.getDouble(0).isPosInfinity)
    // beyond the endpoint clamps to the vertex
    val cl = Seq(Tuple1(Seq((0.0, 0.0), (1.0, 0.0)))).toDF("raw")
      .select(transform($"raw",
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("line"))
      .select(closestPointOnLine($"line", lit(4.0), lit(4.0)).as("c"))
      .select("c.*").head()
    assert(cl.getDouble(0) === 25.0 && cl.getDouble(1) === 1.0)
    // random polylines vs a driver-side reference implementation
    val rnd = new scala.util.Random(17L)
    def segD(px: Double, py: Double, a: (Double, Double), b: (Double, Double)) = {
      val dx = b._1 - a._1; val dy = b._2 - a._2
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0 else math.max(0.0, math.min(1.0,
        ((px - a._1) * dx + (py - a._2) * dy) / l2))
      val cx = a._1 + t * dx; val cy = a._2 + t * dy
      ((px - cx) * (px - cx) + (py - cy) * (py - cy), cx, cy)
    }
    val lines = (1 to 30).map { i =>
      (i.toLong, (0 to 2 + rnd.nextInt(4)).map(_ =>
        (rnd.nextDouble() * 0.4, rnd.nextDouble() * 0.4)))
    }
    val pts = (1 to 80).map(i =>
      (100L + i, rnd.nextDouble() * 0.4, rnd.nextDouble() * 0.4))
    val edf = lines.toDF("eid", "raw").select($"eid", transform($"raw",
      p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("g"))
    val qdf = pts.toDF("qid", "lon", "lat")
      .select($"qid", struct($"lon", $"lat").as("p"))
    val maxD = 0.08
    val got = Geo.nearestEdgeJoin(qdf, "qid", $"p", edf, "eid", $"g",
        maxD, cellDeg = 0.05)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val want = pts.flatMap { case (qid, px, py) =>
      val cands = lines.flatMap { case (eid, vs) =>
        val best = vs.sliding(2).map(w => segD(px, py, w(0), w(1)))
          .minBy(c => (c._1, c._2, c._3))
        if (best._1 <= maxD * maxD) Some((best._1, eid, best._2, best._3)) else None
      }
      if (cands.isEmpty) None
      else { val b = cands.minBy(c => (c._1, c._2))
        Some(qid -> (b._2, b._1, b._3, b._4)) }
    }.toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    got.foreach { case (qid, (eid, d2, sx, sy)) =>
      val (weid, wd2, wsx, wsy) = want(qid)
      assert(eid === weid && math.abs(d2 - wd2) < 1e-15 &&
        math.abs(sx - wsx) < 1e-12 && math.abs(sy - wsy) < 1e-12,
        s"qid $qid: got ($eid,$d2) want ($weid,$wd2)")
    }
  }

  test("orderedListAgg is deterministic under repartition") {
    val df = spark.sparkContext.parallelize(
      (1 to 500).map(i => (i % 7, i, s"v$i")), 13).toDF("g", "s", "v")
    val r = df.groupBy("g").agg(RelOps.orderedListAgg($"s", $"v").as("xs"))
      .collect().map(x => x.getInt(0) -> x.getSeq[String](1)).toMap
    (0 until 7).foreach { g =>
      val expected = (1 to 500).filter(_ % 7 == g).sorted.map(i => s"v$i")
      assert(r(g) === expected)
    }
  }

  test("top1PerGroup matches DISTINCT ON semantics") {
    val df = Seq((1, 5, "a"), (1, 9, "b"), (2, 3, "c"), (2, 3, "d")).toDF("k", "s", "v")
    val r = RelOps.top1PerGroup(df, Seq("k"), Seq($"s".desc, $"v".desc))
      .collect().map(x => x.getInt(0) -> x.getString(2)).toMap
    assert(r === Map(1 -> "b", 2 -> "d"))
  }

  test("deleteWhere keeps NULL-predicate rows (3VL)") {
    val df = Seq(Some("no"), Some("yes"), None).toDF("access")
    val kept = RelOps.deleteWhere(df, $"access" === "no")
      .collect().map(r => Option(r.getString(0))).toSet
    assert(kept === Set(Some("yes"), None))
  }

  test("updateFrom replaces only where-matched rows, keeps others") {
    val target = Seq(("a", Some(1)), ("b", None), ("c", None), ("d", Some(4)))
      .toDF("k", "x")
    val source = Seq(("b", 20), ("d", 40)).toDF("k", "nx")
    val r = RelOps.updateFrom(target, source, Seq("k"), Map("x" -> "nx"),
        whereTarget = col("x").isNull)
      .collect().map(row => row.getString(0) -> Option(row.get(1)).map(_.toString.toInt)).toMap
    assert(r === Map("a" -> Some(1), "b" -> Some(20), "c" -> None, "d" -> Some(4)))
  }

  test("mergeInto: matched updates listed cols only, source-only inserts, target-only passes through") {
    val target = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "tag", "v")
    val source = Seq((2L, "UPD", 200.0), (9L, "NEW", 90.0))
      .toDF("k", "tag", "v")
    val got = RelOps.mergeInto(target, source, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(got(1L) === (("x", 10.0)))     // untouched
    assert(got(2L) === (("y", 200.0)))    // v updated, tag NOT (not listed)
    assert(got(3L) === (("z", 30.0)))
    assert(got(9L) === (("NEW", 90.0)))   // inserted whole
    assert(got.size === 4)
    // guard rails: schema mismatch and key-update both refuse
    intercept[IllegalArgumentException] {
      RelOps.mergeInto(target, source.select($"k", $"v", $"tag"),
        Seq("k"), Seq("v"))
    }
    intercept[IllegalArgumentException] {
      RelOps.mergeInto(target, source, Seq("k"), Seq("k", "v"))
    }
  }

  test("joinAsOf: <= visibility, per-key isolation, no-match nulls") {
    import graft.ops.AsOfJoin
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "t", "rv")
    val r = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t")
      .collect().map(x => x.getAs[String]("ev") -> Option(x.getAs[String]("rv"))).toMap
    assert(r("e1") === Some("r10")) // equal timestamp IS visible
    assert(r("e2") === Some("r15")) // latest at-or-before
    assert(r("e3") === None)        // right row is in the future
  }

  test("joinAsOf: matched row arrives atomically, NULLs included") {
    import graft.ops.AsOfJoin
    // latest right row (t=10) has rv2 NULL; an older row (t=5) has both.
    // ASOF must return the t=10 row verbatim — rv1="a", rv2=NULL — not
    // backfill rv2="y" from t=5 (per-column carry would).
    val left = Seq((1L, 12L, "e1")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, Some("x"), Some("y")), (1L, 10L, Some("a"), None))
      .toDF("k", "t", "rv1", "rv2")
    val row = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "t").head()
    assert(row.getAs[String]("rv1") === "a")
    assert(row.getAs[String]("rv2") === null)
  }

  test("salted join and salted count match their unsalted equivalents") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_partkey", $"l_orderkey", $"l_quantity")
    val dim = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = fact.join(dim, "l_partkey")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = RelOps.saltedJoin(fact, dim, "l_partkey", 8, $"l_orderkey")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    val plainCnt = fact.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saltedCnt = RelOps.saltedCount(fact, "l_partkey", 8, $"l_orderkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltedCnt === plainCnt)
  }

  test("sketch forms track their exact counterparts (HLL distinct, approx percentile)") {
    // the 100 TB-pragmatic forms: approx_count_distinct (HyperLogLog++)
    // and percentile_approx — assert they land within their documented
    // error envelopes of the exact answers on real data
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val r = li.select(
      countDistinct($"l_partkey").as("exact_d"),
      approx_count_distinct($"l_partkey", 0.02).as("approx_d"),
      percentile($"l_quantity", lit(0.5)).as("exact_p"),
      percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("approx_p")).head()
    val (ed, ad) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(ad - ed) / ed < 0.05, s"HLL off: exact=$ed approx=$ad")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 1.0,
      s"approx percentile off: ${r.getDouble(2)} vs ${r.getDouble(3)}")
  }

  private def ringLit(ps: Seq[(Double, Double)]) = array(ps.map { case (x, y) =>
    struct(lit(x).as("lon"), lit(y).as("lat")) }: _*)

  test("polygon kernel: shoelace area, orientation sign, area-weighted centroid") {
    val ccw = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val r = spark.range(1).select(
      Geo.shoelaceSigned(ringLit(ccw)).as("s"),
      Geo.polygonArea(ringLit(ccw)).as("a"),
      Geo.polygonCentroid(ringLit(ccw)).as("c"),
      Geo.shoelaceSigned(ringLit(ccw.reverse)).as("srev"),
      Geo.polygonArea(ringLit(ccw.reverse)).as("arev"),
      Geo.polygonArea(ringLit(Seq((0.0, 0.0), (4.0, 0.0)))).as("deg")).head()
    assert(r.getDouble(0) === 32.0 && r.getDouble(1) === 16.0)
    val c = r.getStruct(2)
    assert(c.getDouble(0) === 2.0 && c.getDouble(1) === 2.0)
    assert(r.getDouble(3) === -32.0 && r.getDouble(4) === 16.0) // CW flips sign only
    assert(r.getDouble(5) === 0.0)
    // trapezoid (0,0)(4,0)(4,1)(1,1): centroid (47/21, 10/21) — the
    // area-weighted answer, NOT the vertex mean (9/4, 1/2)
    val tz = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0))
    val ct = spark.range(1).select(Geo.polygonCentroid(ringLit(tz)).as("c"))
      .select("c.*").head()
    assert(ct.getDouble(0) === 47.0 / 21.0 && ct.getDouble(1) === 10.0 / 21.0)
  }

  test("polygon kernel: ray-cast containment handles non-convex rings") {
    // L-shape: the naive convex test would claim (3,3) inside
    val l = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    val probes = Seq(
      (1.0, 1.0, true), (3.0, 1.0, true), (1.0, 3.0, true), (2.5, 1.9, true),
      (3.0, 3.0, false), (2.5, 2.1, false), (5.0, 1.0, false), (-1.0, 2.5, false))
    probes.toDF("x", "y", "want")
      .withColumn("got", Geo.containsPoint(ringLit(l),
        struct($"x".as("lon"), $"y".as("lat"))))
      .collect().foreach { r =>
        assert(r.getBoolean(3) === r.getBoolean(2),
          s"(${r.getDouble(0)},${r.getDouble(1)}) want ${r.getBoolean(2)}")
      }
  }

  test("earTriangulate partitions concave rings; general intersection") {
    import graft.functions.GraftFunctions.earTriangulate
    def tris(r: Seq[(Double, Double)]) = spark.range(1)
      .select(earTriangulate(ringLit(r)).as("t"))
      .select(size($"t").as("n"),
        aggregate($"t", lit(0.0),
          (acc, tri) => acc + Geo.shoelaceSigned(tri) / 2).as("area"),
        aggregate($"t", lit(true),
          (acc, tri) => acc && Geo.shoelaceSigned(tri) > 0).as("allCcw"))
      .head()
    // L-shape (concave, 6 vertices, CW input): 4 CCW triangles, area 12
    val l = Seq((0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 2.0), (4.0, 2.0), (4.0, 0.0))
    val lt = tris(l)
    assert(lt.getInt(0) === 4 && lt.getDouble(1) === 12.0 && lt.getBoolean(2))
    // collinear vertex drops as a zero-area ear, no area lost
    val col3 = Seq((0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val ct = tris(col3)
    assert(ct.getDouble(1) === 16.0 && ct.getBoolean(2))
    // degenerate rings
    assert(tris(Seq((0.0, 0.0), (1.0, 1.0))).getInt(0) === 0)
    // property: random star-shaped rings (simple by construction) —
    // triangle areas sum to the ring area
    val rnd = new scala.util.Random(7L)
    (1 to 10).foreach { _ =>
      val n = rnd.nextInt(12) + 4
      val ring = (0 until n).map { i =>
        val a = 2 * math.Pi * i / n
        val r = rnd.nextDouble() * 4 + 1
        (r * math.cos(a), r * math.sin(a))
      }
      val want = ring.indices.map { i =>
        val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % n)
        x1 * y2 - x2 * y1
      }.sum / 2
      val got = tris(ring)
      assert(math.abs(got.getDouble(1) - math.abs(want)) < 1e-9,
        s"area ${got.getDouble(1)} want $want over $ring")
      assert(got.getBoolean(2))
    }
    // disconnected intersection: U-shape ∩ horizontal band = the two
    // arm tops — pieces from >=2 disjoint regions, total area 2
    val u = Seq((0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (2.0, 3.0),
      (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val band = Seq((0.0, 2.0), (3.0, 2.0), (3.0, 3.0), (0.0, 3.0))
    val got = spark.range(1).select(
        round(Geo.intersectionArea(ringLit(band), ringLit(u)), 9).as("a"),
        size(Geo.intersectionPieces(ringLit(band), ringLit(u))).as("np"))
      .head()
    assert(got.getDouble(0) === 2.0)
    assert(got.getInt(1) >= 2, s"expected >=2 pieces, got ${got.getInt(1)}")
  }

  test("differenceArea: concave-capable subtraction, area identity vs intersectionArea") {
    def dArea(a: Seq[(Double, Double)], b: Seq[(Double, Double)]) =
      spark.range(1)
        .select(round(Geo.differenceArea(ringLit(a), ringLit(b)), 9))
        .head().getDouble(0)
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val inner = Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))
    assert(dArea(square, inner) === 12.0) // hole carved out: 16 − 4
    assert(dArea(inner, square) === 0.0)  // contained → nothing left
    assert(dArea(square,
      Seq((10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0))) === 16.0)
    // corner overlap: minus [2,6]² removes the 2×2 shared corner
    assert(dArea(square, Seq((2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)))
      === 12.0)
    // concave CLIP: square minus an L (L ⊂ square, area 12) leaves 4
    val l = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    assert(dArea(square, l) === 4.0)
    // concave SUBJECT: L minus the right half-plane strip x>=2 leaves
    // the left column [0,2]×[0,4] = 8
    assert(dArea(l, Seq((2.0, -1.0), (5.0, -1.0), (5.0, 5.0), (2.0, 5.0)))
      === 8.0)
    assert(dArea(l, square) === 0.0)
    // symmetric difference: two unit-offset 4×4 squares overlap 3×4=12,
    // so A△B = 2·(16−12) = 8
    val shifted = Seq((1.0, 0.0), (5.0, 0.0), (5.0, 4.0), (1.0, 4.0))
    val sd = spark.range(1)
      .select(round(
        Geo.symmetricDifferenceArea(ringLit(square), ringLit(shifted)), 9))
      .head().getDouble(0)
    assert(sd === 8.0)
    // property: area(A∖B) = area(A) − area(A∩B) on random star rings
    val rnd = new scala.util.Random(11L)
    (1 to 8).foreach { _ =>
      def star() = {
        // radial ring around a shifted center: simple by construction
        val n = rnd.nextInt(8) + 4
        val ox = rnd.nextDouble() * 2; val oy = rnd.nextDouble() * 2
        (0 until n).map { i =>
          val ang = 2 * math.Pi * i / n
          val r = rnd.nextDouble() * 3 + 1
          (r * math.cos(ang) + ox, r * math.sin(ang) + oy)
        }
      }
      val a = star(); val b = star()
      val row = spark.range(1).select(
          Geo.differenceArea(ringLit(a), ringLit(b)).as("d"),
          Geo.intersectionArea(ringLit(a), ringLit(b)).as("i"),
          (abs(Geo.shoelaceSigned(ringLit(a))) / 2).as("sa"))
        .head()
      val (d, i, sa) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(math.abs(d - (sa - i)) < 1e-9,
        s"diff $d != area $sa - inter $i over $a minus $b")
    }
  }

  test("geometry booleans: convexClip cases, lineIntersections cases") {
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    def clip(subj: Seq[(Double, Double)], c: Seq[(Double, Double)]) =
      spark.range(1)
        .select(Geo.convexClip(ringLit(subj), ringLit(c)).as("r"))
        .select(size($"r").as("nv"),
          (Geo.shoelaceSigned($"r") / 2).as("area")).head()
    // contained clip: result is the clip rect itself
    val inner = clip(square, Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)))
    assert(inner.getInt(0) === 4 && inner.getDouble(1) === 4.0)
    // disjoint: empty ring
    val far = clip(square, Seq((10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0)))
    assert(far.getInt(0) === 0)
    // subject fully inside clip: unchanged subject (area 16, CCW kept)
    val envelope = clip(square, Seq((-1.0, -1.0), (5.0, -1.0), (5.0, 5.0), (-1.0, 5.0)))
    assert(envelope.getInt(0) === 4 && envelope.getDouble(1) === 16.0)
    // CONCAVE subject (L-shape) against a convex half-overlap: area of
    // L = 12; clip x<=2 keeps the left column [0,2]x[0,4] = area 8
    val lShape = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    val half = clip(lShape, Seq((-1.0, -1.0), (2.0, -1.0), (2.0, 5.0), (-1.0, 5.0)))
    assert(half.getDouble(1) === 8.0, s"L-clip area ${half.getDouble(1)}")

    def inters(a: Seq[(Double, Double)], b: Seq[(Double, Double)]) =
      spark.range(1)
        .select(Geo.lineIntersections(ringLit(a), ringLit(b)).as("p"))
        .select(explode($"p").as("pt")).select("pt.*")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // X crossing at the midpoint
    assert(inters(Seq((0.0, 0.0), (2.0, 2.0)), Seq((0.0, 2.0), (2.0, 0.0)))
      === Seq((1.0, 1.0)))
    // endpoint touch counts (ST_Touches semantics)
    assert(inters(Seq((0.0, 0.0), (1.0, 0.0)), Seq((1.0, 0.0), (1.0, 1.0)))
      === Seq((1.0, 0.0)))
    // parallel and collinear-overlap: no points (documented contract)
    assert(inters(Seq((0.0, 0.0), (2.0, 0.0)), Seq((0.0, 1.0), (2.0, 1.0))).isEmpty)
    assert(inters(Seq((0.0, 0.0), (2.0, 0.0)), Seq((1.0, 0.0), (3.0, 0.0))).isEmpty)
    // multi-segment polylines: zigzag crosses a horizontal twice, and
    // the result array is sorted-distinct
    val zig = Seq((0.0, -1.0), (1.0, 1.0), (2.0, -1.0))
    assert(inters(zig, Seq((0.0, 0.0), (2.0, 0.0)))
      === Seq((0.5, 0.0), (1.5, 0.0)))
  }

  test("polygon kernel: WKT asText/parse round-trip, point/line parsers") {
    val ring = Seq((10.5, 20.0), (30.0, 20.0), (30.0, 40.5), (10.5, 40.5))
    val out = spark.range(1).select(Geo.asTextPolygon(ringLit(ring)).as("w"))
      .withColumn("back", Geo.parseWktPolygon($"w"))
      .withColumn("a", Geo.polygonArea($"back")).head()
    assert(out.getString(0) ===
      "POLYGON((10.5 20.0, 30.0 20.0, 30.0 40.5, 10.5 40.5, 10.5 20.0))")
    assert(out.getSeq[Any](1).size === 4) // closing vertex dropped on parse
    assert(out.getDouble(2) === 19.5 * 20.5)
    // unclosed polygon text is accepted too (PostGIS is strict; we parse both)
    val a2 = spark.range(1).select(Geo.polygonArea(
      Geo.parseWktPolygon(lit("POLYGON((0 0, 2 0, 2 2, 0 2))"))).as("a")).head()
    assert(a2.getDouble(0) === 4.0)
    val p = spark.range(1)
      .select(Geo.parseWktPoint(lit("point(3.5 -7.25)")).as("p"))
      .select("p.*").head()
    assert(p.getDouble(0) === 3.5 && p.getDouble(1) === -7.25)
    val ln = spark.range(1)
      .select(Geo.parseWktLine(lit("LINESTRING(0 0, 1 2, 3 4)")).as("l")).head()
    assert(ln.getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getDouble(0), r.getDouble(1))) === Seq((0.0, 0.0), (1.0, 2.0), (3.0, 4.0)))
    // multilinestring text
    val ml = spark.range(1).select(Geo.asTextMultiLine(array(
      ringLit(Seq((0.0, 0.0), (1.0, 1.0))),
      ringLit(Seq((2.0, 2.0), (3.0, 3.0))))).as("t")).head()
    assert(ml.getString(0) ===
      "MULTILINESTRING((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 3.0))")
  }

  test("containsJoin == brute force (random rects + a non-convex ring)") {
    val rnd = new scala.util.Random(11L)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(100).toDouble, rnd.nextInt(100).toDouble))
      .toDF("pid", "x", "y")
      .select($"pid", struct($"x".as("lon"), $"y".as("lat")).as("p"))
    def rect(id: Long) = {
      val (x0, y0) = (rnd.nextInt(60) + 0.25, rnd.nextInt(60) + 0.25)
      val (w, h) = (rnd.nextInt(35) + 1, rnd.nextInt(35) + 1)
      (id, Seq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)))
    }
    // last ring is a concave L spanning many grid cells
    val rings = (1L to 8L).map(rect) :+
      (9L, Seq((0.25, 0.25), (80.25, 0.25), (80.25, 40.25), (40.25, 40.25),
        (40.25, 90.25), (0.25, 90.25)))
    val polys = rings.toDF("gid", "ring").select($"gid",
      transform($"ring", t => struct(t.getField("_1").as("lon"),
        t.getField("_2").as("lat"))).as("ring"))
    val got = Geo.containsJoin(pts, "pid", $"p", polys, "gid", $"ring",
        cellDeg = 13.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pts.crossJoin(polys)
      .filter(Geo.containsPoint($"ring", $"p"))
      .select("pid", "gid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute && got.nonEmpty,
      s"grid ${got.size} pairs vs brute ${brute.size}")
  }

  test("convexHull == gift-wrapping reference; CCW; stable under repartition") {
    // independent reference: Jarvis march (different algorithm family
    // from the aggregate's monotone chain)
    def jarvis(pts: Set[(Double, Double)]): List[(Double, Double)] = {
      if (pts.size <= 2) return pts.toList.sorted
      def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
        (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
      val start = pts.min
      val out = scala.collection.mutable.ListBuffer(start)
      var cur = start
      while ({
        var next = pts.find(_ != cur).get
        pts.foreach { p =>
          if (p != cur) {
            val c = cross(cur, next, p)
            // CCW walk: swing the candidate edge while some point is
            // still clockwise of it; on collinear ties take the farther
            // point, so collinear mids drop out
            val d = (p._1 - cur._1) * (p._1 - cur._1) + (p._2 - cur._2) * (p._2 - cur._2)
            val dn = (next._1 - cur._1) * (next._1 - cur._1) + (next._2 - cur._2) * (next._2 - cur._2)
            if (c < 0 || (c == 0 && d > dn)) next = p
          }
        }
        cur = next
        cur != start && { out += cur; true }
      }) ()
      out.toList
    }
    val rnd = new scala.util.Random(23L)
    // 3 groups: cloud, cloud-with-collinear-edges, tiny degenerate
    val rows = (1 to 900).map { i =>
      val g = i % 3
      val (x, y) = g match {
        case 0 => (rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble)
        case 1 => (rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble) // dense: many collinear boundary points
        case _ => if (i % 2 == 0) (1.0, 1.0) else (5.0, 9.0) // 2-point degenerate group
      }
      (g.toLong, x, y)
    }
    val df = rows.toDF("g", "x", "y")
      .select($"g", struct($"x".as("lon"), $"y".as("lat")).as("p"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(GF.convexHull($"p").as("h")).collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(q => (q.getDouble(0), q.getDouble(1))).toList).toMap
    val got = run(df)
    val again = run(df.repartition(13))
    assert(got === again, "hull not deterministic under repartition")
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val want = jarvis(rs.map(r => (r._2, r._3)).toSet)
      assert(got(g) === want, s"group $g: ${got(g)} vs jarvis $want")
      // CCW and starts at the lexicographic min vertex
      assert(got(g).head === rs.map(r => (r._2, r._3)).toSet.min)
    }
    // composes with the polygon kernel: hull area positive (CCW), every
    // input point inside-or-on -> jitter inward a hair and test one
    val hull0 = got(0L)
    assert(hull0.size >= 3)
    val area = spark.range(1).select(
      Geo.shoelaceSigned(ringLit(hull0)).as("s")).head().getDouble(0)
    assert(area > 0, s"hull not CCW: signed 2A = $area")
  }

  test("convexHull compacts oversized buffers without changing the result") {
    // one group far beyond CompactAt=512 points; ring of radius r plus
    // interior noise -> hull == the extreme ring points regardless of
    // how many compactions ran
    val rnd = new scala.util.Random(31L)
    val ring = (0 until 36).map { i =>
      val a = i * math.Pi / 18
      (math.round(1000 * math.cos(a)).toDouble, math.round(1000 * math.sin(a)).toDouble)
    }
    val noise = (1 to 3000).map(_ =>
      (rnd.nextInt(900) - 450.0, rnd.nextInt(900) - 450.0))
    val df = (ring ++ noise).toDF("x", "y")
      .select(struct($"x".as("lon"), $"y".as("lat")).as("p"))
    def hullOf(d: org.apache.spark.sql.DataFrame) =
      d.agg(GF.convexHull($"p").as("h")).collect().head
        .getSeq[org.apache.spark.sql.Row](0)
        .map(q => (q.getDouble(0), q.getDouble(1))).toList
    val one = hullOf(df.coalesce(1))      // single partition: update-path compactions
    val many = hullOf(df.repartition(17)) // partials + merge-path compactions
    assert(one === many)
    assert(one.size >= 30 && one.size <= 36, s"ring hull size ${one.size}")
    assert(one.toSet.subsetOf(ring.toSet), "hull kept a non-extreme point")
  }

  test("pseudoAngle orders points exactly as atan2 over (-90°, 270°)") {
    val pts = (0 until 72).map { i =>
      val a = i * math.Pi / 36
      (math.cos(a) * (1 + i % 3), math.sin(a) * (1 + i % 3), i.toLong)
    }
    val byPa = pts.toDF("dx", "dy", "i")
      .select($"i", Geo.pseudoAngle($"dx", $"dy").as("pa"))
      .collect().sortBy(_.getDouble(1)).map(_.getLong(0)).toList
    val byAtan = pts.sortBy { case (dx, dy, _) =>
      val a = math.toDegrees(math.atan2(dy, dx))
      if (a < -90) a + 360 else a // same branch cut as pseudoAngle
    }.map(_._3).toList
    assert(byPa === byAtan)
  }

  test("polygonAreaM2: projected area consistent with planar edge lengths") {
    val (lon, lat, d) = (-91.87, 63.39, 0.1)
    val sq = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d))
    val r = spark.range(1).select(
      Geo.polygonAreaM2(ringLit(sq)).as("a2"),
      Geo.planarLengthMeters(ringLit(Seq((lon, lat), (lon + d, lat)))).as("w"),
      Geo.planarLengthMeters(ringLit(Seq((lon, lat), (lon, lat + d)))).as("h")).head()
    val approx = r.getDouble(1) * r.getDouble(2)
    // the projected square is a near-parallelogram (meridian convergence
    // skews it slightly); shoelace vs edge product agree to ~1%
    assert(math.abs(r.getDouble(0) / approx - 1) < 0.01,
      s"area ${r.getDouble(0)} vs edge product $approx")
  }

  test("bufferConvex/bufferPoint: closed-form areas (square -> s^2+4sr+pi r^2, disc -> n-gon), convexity preserved") {
    import org.apache.spark.sql.DataFrame
    def areaOf(df: DataFrame): Double = df.head().getDouble(0)
    // unit square, r=0.5, quadSegs=8: sampled arcs are inscribed, so
    // the EXACT expected area is s^2 + 4sr + 16 r^2 sin(pi/16); the
    // true Minkowski area s^2 + 4sr + pi r^2 is approached within
    // pi r^2 (1 - sinc(pi/16)) ~ 0.005
    val sq = Seq(1).toDF("one").select(array(
      struct(lit(0.0).as("lon"), lit(0.0).as("lat")),
      struct(lit(1.0).as("lon"), lit(0.0).as("lat")),
      struct(lit(1.0).as("lon"), lit(1.0).as("lat")),
      struct(lit(0.0).as("lon"), lit(1.0).as("lat"))).as("ring"))
    val r = 0.5
    val buffered = sq.select(Geo.bufferConvex(col("ring"), r, 8).as("b"))
    val a = areaOf(buffered.select(Geo.polygonArea(col("b"))))
    val exactSampled = 1.0 + 4 * r + 16 * r * r * math.sin(math.Pi / 16)
    assert(math.abs(a - exactSampled) < 1e-9,
      s"sampled-arc closed form: $a vs $exactSampled")
    assert(math.abs(a - (1.0 + 4 * r + math.Pi * r * r)) < 0.01,
      s"Minkowski area within stated tolerance: $a")
    // buffered ring stays convex and CCW: every cross product positive
    val ringPts = buffered.select(explode(col("b")).as("p"))
      .collect().map(x => (x.getStruct(0).getDouble(0), x.getStruct(0).getDouble(1)))
    val m = ringPts.length
    assert(m === 4 * 9, "4 vertices x (8 arc steps + 1)")
    (0 until m).foreach { i =>
      val (ax, ay) = ringPts(i)
      val (bx, by) = ringPts((i + 1) % m)
      val (cx, cy) = ringPts((i + 2) % m)
      val cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      assert(cross > -1e-12, s"reflex turn at $i: $cross")
    }
    // point disc: regular 32-gon, area (n/2) r^2 sin(2pi/n)
    val disc = Seq(1).toDF("one")
      .select(Geo.bufferPoint(
        struct(lit(3.0).as("lon"), lit(4.0).as("lat")), 2.0, 8).as("b"))
    val ad = areaOf(disc.select(Geo.polygonArea(col("b"))))
    val expectDisc = 16.0 * 4.0 * math.sin(2 * math.Pi / 32)
    assert(math.abs(ad - expectDisc) < 1e-9, s"$ad vs $expectDisc")
    assert(math.abs(ad - math.Pi * 4.0) < 0.1)
  }

  test("bufferConvex: collinear vertex emits one point, no degenerate ring edge") {
    // unit square with a collinear midpoint on the bottom edge: the
    // extra vertex has delta = 0 (edge direction unchanged) and must
    // contribute exactly ONE offset point, not a duplicated pair
    val sq5 = Seq(1).toDF("one").select(array(
      struct(lit(0.0).as("lon"), lit(0.0).as("lat")),
      struct(lit(0.5).as("lon"), lit(0.0).as("lat")),
      struct(lit(1.0).as("lon"), lit(0.0).as("lat")),
      struct(lit(1.0).as("lon"), lit(1.0).as("lat")),
      struct(lit(0.0).as("lon"), lit(1.0).as("lat"))).as("ring"))
    val r = 0.5
    val b = sq5.select(Geo.bufferConvex(col("ring"), r, 8).as("b"))
    val pts = b.select(explode(col("b")).as("p")).collect()
      .map(x => (x.getStruct(0).getDouble(0), x.getStruct(0).getDouble(1)))
    // 4 corners x 9 arc points + 1 collinear vertex x 1 point
    assert(pts.length === 4 * 9 + 1, s"got ${pts.length} ring points")
    pts.indices.foreach { i =>
      val (ax, ay) = pts(i); val (bx, by) = pts((i + 1) % pts.length)
      assert(math.abs(ax - bx) > 1e-12 || math.abs(ay - by) > 1e-12,
        s"duplicate consecutive ring point at $i: ($ax,$ay)")
    }
    // area identical to the 4-vertex square's buffer (same hull)
    val a5 = b.select(Geo.polygonArea(col("b"))).head().getDouble(0)
    val exactSampled = 1.0 + 4 * r + 16 * r * r * math.sin(math.Pi / 16)
    assert(math.abs(a5 - exactSampled) < 1e-9, s"$a5 vs $exactSampled")
  }

  test("property: reverse(reverse(a)) == a (seeded)") {
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val xs = List.fill(rnd.nextInt(20))(rnd.nextLong())
      val df = Seq(Tuple1(xs)).toDF("a")
      val r = df.select(reverse(reverse($"a"))).head.getSeq[Long](0)
      assert(r.toList === xs)
    }
  }
}
