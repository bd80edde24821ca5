package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{Interp, Reducers}
import graft.model.Policies
import graft.model.Policies._

class CfConvSpec extends AnyFunSuite {

  // the s2plus fixture shape: 1D projected x/y AND 2D lon/lat, plus a
  // transverse_mercator grid-mapping var (reference: sampledata.py:211-292)
  val s2Dims: Map[String, Seq[String]] = Map(
    "x" -> Seq("x"), "y" -> Seq("y"),
    "lon" -> Seq("y", "x"), "lat" -> Seq("y", "x"),
    "rrs_443" -> Seq("y", "x"), "rrs_665" -> Seq("y", "x"))
  val s2Attrs: Map[String, CfConv.Attrs] = Map(
    "x" -> Map("units" -> "m", "standard_name" -> "projection_x_coordinate"),
    "y" -> Map("units" -> "m", "standard_name" -> "projection_y_coordinate"),
    "lon" -> Map("units" -> "degrees_east", "standard_name" -> "longitude"),
    "lat" -> Map("units" -> "degrees_north", "standard_name" -> "latitude"),
    "rrs_443" -> Map("grid_mapping" -> "transverse_mercator"),
    "rrs_665" -> Map("grid_mapping" -> "transverse_mercator"),
    "transverse_mercator" -> Map(
      "grid_mapping_name" -> "transverse_mercator",
      "scale_factor_at_central_meridian" -> "0.9996",
      "longitude_of_central_meridian" -> "3.0",
      "latitude_of_projection_origin" -> "0.0",
      "false_easting" -> "500000.0",
      "false_northing" -> "0.0"))

  test("CF transverse_mercator attrs resolve to a working CRS") {
    val crs = CfConv.crsFromAttrs(s2Attrs("transverse_mercator")).get
    assert(!crs.isGeographic)
    // fixture: x ~310005, y ~5689995 <-> lon ~0.2728, lat ~51.3295
    val (lon, lat) = crs.toLonLat(310005.0, 5689995.0)
    assert(math.abs(lon - 0.272763) < 1e-4, s"lon $lon")
    assert(math.abs(lat - 51.329464) < 1e-4, s"lat $lat")
  }

  test("CF albers_conical_equal_area attrs roundtrip through crsToAttrs/crsFromAttrs") {
    val attrs = Map(
      "grid_mapping_name" -> "albers_conical_equal_area",
      "standard_parallel" -> "[29.5, 45.5]",
      "latitude_of_projection_origin" -> "23.0",
      "longitude_of_central_meridian" -> "-96.0",
      "false_easting" -> "0.0",
      "false_northing" -> "0.0")
    val crs = CfConv.crsFromAttrs(attrs).get.asInstanceOf[Crs.AlbersEqualAreaConic]
    assert(crs.lat1Deg == 29.5 && crs.lat2Deg == 45.5 && crs.lon0Deg == -96.0)
    // emitted attrs parse back to the same parameters
    val back = CfConv.crsFromAttrs(CfConv.crsToAttrs(crs)).get
    assert(back == crs)
    // single-valued standard_parallel folds to a one-parallel cone
    val one = CfConv.crsFromAttrs(attrs + ("standard_parallel" -> "40.0")).get
      .asInstanceOf[Crs.AlbersEqualAreaConic]
    assert(one.lat1Deg == 40.0 && one.lat2Deg == 40.0)
  }

  test("multi-grid-mapping dataset: prefer regular 1D projected coords") {
    val cands = CfConv.findCandidates(s2Dims, s2Attrs)
    assert(cands.length >= 2) // projected 1D pair + geographic 2D pair
    val chosen = CfConv.select(cands, preferIsRegular = true)
    assert(chosen.coords == CfConv.CoordVars("x", "y", is2D = false, "projected"))
    assert(!chosen.crs.isGeographic)
    // prefer_crs overrides: ask for geographic -> 2D lon/lat pair
    val geo = CfConv.select(cands, preferCrs = Some(Crs.Geographic))
    assert(geo.coords.is2D && geo.crs.isGeographic)
  }

  test("implicit WGS84 when only lon/lat names exist (highroc shape)") {
    val dims = Map("lon" -> Seq("y", "x"), "lat" -> Seq("y", "x"), "conc_chl" -> Seq("y", "x"))
    val attrs = Map("conc_chl" -> Map("units" -> "mg m-3"))
    val cands = CfConv.findCandidates(dims, attrs)
    assert(cands.length == 1)
    assert(cands.head.crs == Crs.Geographic && cands.head.coords.is2D)
  }

  test("EPSG spatial_ref wkt resolves") {
    val wkt = """PROJCS["WGS 84 / UTM zone 32N",AUTHORITY["EPSG","32632"]]"""
    assert(CfConv.crsFromAttrs(Map("spatial_ref" -> wkt)).get.name == "EPSG:32632")
  }

  test("bounds vars are excluded from coord discovery") {
    val dims = Map("lon" -> Seq("x"), "lat" -> Seq("y"),
      "lon_bnds" -> Seq("x"), "lat_bnds" -> Seq("y"))
    val attrs = Map(
      "lon" -> Map("bounds" -> "lon_bnds"), "lat" -> Map("bounds" -> "lat_bnds"))
    val pairs = CfConv.findCoordPairs(dims, attrs)
    assert(pairs == Seq(CfConv.CoordVars("lon", "lat", is2D = false)))
  }

  // ------------------- policy resolution (reference: utils.py:192-333)

  // CF rotated-pole attrs as in the reference's CRS_ROTATED_POLE
  // fixture (tests/gridmapping/test_cfconv.py:45-50)
  val rotatedPoleAttrs: CfConv.Attrs = Map(
    "grid_mapping_name" -> "rotated_latitude_longitude",
    "grid_north_pole_latitude" -> "32.5",
    "grid_north_pole_longitude" -> "170.0")

  test("rotated pole with common names (test_cfconv.py:239-256)") {
    val dims = Map("rlon" -> Seq("rlon"), "rlat" -> Seq("rlat"))
    val attrs = Map("rotated_pole" -> rotatedPoleAttrs)
    val cands = CfConv.findCandidates(dims, attrs)
    assert(cands.length == 1)
    val c = cands.head
    assert(c.gmVarName.contains("rotated_pole"))
    assert(c.coords == CfConv.CoordVars("rlon", "rlat", is2D = false, "rotated"))
    assert(c.crs == Crs.RotatedPole(32.5, 170.0, 0.0, "CF:rotated_pole"))
  }

  test("rotated pole with standard names (test_cfconv.py:258-285)") {
    val dims = Map("u" -> Seq("u"), "v" -> Seq("v"))
    val attrs = Map(
      "rotated_pole" -> rotatedPoleAttrs,
      "u" -> Map("standard_name" -> "grid_longitude"),
      "v" -> Map("standard_name" -> "grid_latitude"))
    val cands = CfConv.findCandidates(dims, attrs)
    assert(cands.length == 1)
    val c = cands.head
    assert(c.coords == CfConv.CoordVars("u", "v", is2D = false, "rotated"))
    assert(c.crs.isInstanceOf[Crs.RotatedPole])
  }

  test("rotated pole is NOT interchangeable with plain geographic") {
    val rp = CfConv.crsFromAttrs(rotatedPoleAttrs).get
    assert(!rp.equalsCrs(Crs.Geographic))
    // round-trips through CF attrs
    assert(CfConv.crsFromAttrs(CfConv.crsToAttrs(rp)).get == rp)
  }

  test("get_spatial_dims contract: lon/lat preferred, KeyError-like otherwise (utils.py:47-74)") {
    assert(CfConv.getSpatialDims(Set("lon", "lat", "time")) == ("lon", "lat"))
    assert(CfConv.getSpatialDims(Set("x", "y")) == ("x", "y"))
    assert(CfConv.getSpatialDims(Set("lon", "lat", "x", "y")) == ("lon", "lat"))
    intercept[NoSuchElementException] { CfConv.getSpatialDims(Set("u", "v")) }
  }

  test("grid mapping name: at most one distinct, else assertion (utils.py:164-178)") {
    val ok = Map(
      "a" -> Map("grid_mapping" -> "tm"),
      "b" -> Map("grid_mapping" -> "tm"))
    assert(CfConv.getGridMappingName(ok, Set("a", "b", "tm")).contains("tm"))
    assert(CfConv.getGridMappingName(Map.empty, Set("x")).isEmpty)
    assert(CfConv.getGridMappingName(Map.empty, Set("crs")).contains("crs"))
    intercept[IllegalArgumentException] {
      CfConv.getGridMappingName(ok + ("c" -> Map("grid_mapping" -> "other")), Set("a"))
    }
    intercept[IllegalArgumentException] {
      CfConv.getGridMappingName(ok, Set("spatial_ref")) // tm + spatial_ref
    }
  }

  test("policy defaults by dtype") {
    val f = Policies.resolve("a", F64)
    assert(f.interp == Interp.BILINEAR && f.agg == Reducers.Mean && f.fill.isNaN)
    val i = Policies.resolve("b", I32)
    assert(i.interp == Interp.NEAREST && i.agg == Reducers.Center && i.fill == -1.0)
    assert(Policies.resolve("c", U8).fill == 255.0)
    assert(Policies.resolve("d", U16).fill == 65535.0)
    assert(!f.recoverNan)
  }

  test("policy resolution precedence: var name > dtype > default") {
    val interp = Options[Int](byVar = Map("a" -> Interp.TRIANGULAR),
      byDtype = Map("float64" -> Interp.NEAREST))
    assert(Policies.resolve("a", F64, interp = interp).interp == Interp.TRIANGULAR)
    assert(Policies.resolve("z", F64, interp = interp).interp == Interp.NEAREST)
    assert(Policies.resolve("z", F32, interp = interp).interp == Interp.BILINEAR) // default
    val scalar = Options.of(Interp.NEAREST)
    assert(Policies.resolve("a", F64, interp = scalar).interp == Interp.NEAREST)
  }

  test("triangular -> bilinear downscale prep rewrite (reference: utils.py:239-251)") {
    val o = Options[Int](scalar = Some(Interp.TRIANGULAR),
      byVar = Map("a" -> Interp.TRIANGULAR, "b" -> Interp.NEAREST))
    val p = Policies.prepInterpDownscale(o)
    assert(p.scalar.contains(Interp.BILINEAR))
    assert(p.byVar("a") == Interp.BILINEAR && p.byVar("b") == Interp.NEAREST)
  }

  def samePoint(a: Crs, b: Crs, lon: Double, lat: Double, tol: Double = 1e-9): Unit = {
    val (x1, y1) = a.fromLonLat(lon, lat)
    val (x2, y2) = b.fromLonLat(lon, lat)
    assert(math.abs(x1 - x2) < tol && math.abs(y1 - y2) < tol,
      s"($lon,$lat): ($x1,$y1) vs ($x2,$y2)")
  }

  test("proj-string parsing covers every implemented family") {
    assert(Crs.fromString("+proj=longlat +datum=WGS84 +no_defs") == Crs.Geographic)
    assert(Crs.fromString("+proj=utm +zone=32 +datum=WGS84").name == "EPSG:32632")
    assert(Crs.fromString("+proj=utm +zone=33 +south +datum=WGS84").name == "EPSG:32733")
    samePoint(
      Crs.fromString("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80"),
      Crs.lambert93, 4.1, 45.2)
    samePoint(
      Crs.fromString("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80"),
      Crs.laea3035, 8.3, 50.1)
    samePoint(
      Crs.fromString("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +datum=WGS84"),
      Crs.antarcticPolarStereo, 110.0, -75.0)
    samePoint(
      Crs.fromString("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84"),
      Crs.npsPolarStereo, -30.0, 78.0)
    Crs.fromString("+proj=ob_tran +o_proj=longlat +o_lat_p=32.5 +o_lon_p=0 +lon_0=250") match {
      case rp: Crs.RotatedPole =>
        assert(rp.poleLatDeg == 32.5 && rp.poleLonDeg == 70.0 && rp.axisLonDeg == 0.0)
      case other => fail(s"expected RotatedPole, got $other")
    }
  }

  test("WKT parsing: parameters for known projections, outer EPSG authority preferred") {
    val lccWkt =
      """PROJCS["RGF93 / Lambert-93",
        |  GEOGCS["RGF93",DATUM["Reseau_Geodesique_Francais_1993",
        |    SPHEROID["GRS 1980",6378137,298.257222101]],AUTHORITY["EPSG","4171"]],
        |  PROJECTION["Lambert_Conformal_Conic_2SP"],
        |  PARAMETER["standard_parallel_1",49],
        |  PARAMETER["standard_parallel_2",44],
        |  PARAMETER["latitude_of_origin",46.5],
        |  PARAMETER["central_meridian",3],
        |  PARAMETER["false_easting",700000],
        |  PARAMETER["false_northing",6600000]]""".stripMargin
    samePoint(Crs.fromString(lccWkt), Crs.lambert93, -1.2, 48.9)
    // outer authority wins when the registry knows the code
    assert(Crs.fromString(
      """PROJCS["WGS 84 / UTM zone 32N",PROJECTION["Transverse_Mercator"],
        |AUTHORITY["EPSG","32632"]]""".stripMargin).name == "EPSG:32632")
    // plain GEOGCS is geographic
    assert(Crs.fromString("""GEOGCS["WGS 84",DATUM["WGS_1984"]]""") == Crs.Geographic)
  }

  test("unsupported CRSs fail loudly with the supported list") {
    // EPSG:4087 is equidistant cylindrical (eqc) — a family this
    // registry does not implement (6933, the old example, became the
    // supported EASE-2 cylindrical EQUAL-AREA in round 13)
    for (bad <- Seq("EPSG:4087", "+proj=sinu +lon_0=0",
        """PROJCS["x",PROJECTION["Sinusoidal"]]""")) {
      val ex = intercept[IllegalArgumentException](Crs.fromString(bad))
      assert(ex.getMessage.contains("supported:"), s"$bad -> ${ex.getMessage}")
    }
  }

  test("CF attrs roundtrip for the new projection families") {
    for (crs <- Seq(Crs.lambert93, Crs.npsPolarStereo, Crs.antarcticPolarStereo)) {
      val parsed = CfConv.crsFromAttrs(CfConv.crsToAttrs(crs)).get
      // parameter-identical transforms (names/ellipsoid defaults may differ)
      val lat = if (crs == Crs.lambert93) 46.0 else if (crs == Crs.antarcticPolarStereo) -80.0 else 80.0
      val (x1, y1) = crs.fromLonLat(5.0, lat)
      val (x2, y2) = parsed.fromLonLat(5.0, lat)
      // ellipsoid attrs now ride along in crsToAttrs, so every family
      // round-trips transform-identical (lambert93's GRS80 included)
      val tol = 1e-9
      assert(math.abs(x1 - x2) < tol && math.abs(y1 - y2) < tol, s"${crs.name}: ($x1,$y1) vs ($x2,$y2)")
    }
    assert(CfConv.crsFromAttrs(Map("grid_mapping_name" -> "mercator")).contains(Crs.WebMercator))
    // sinusoidal / equal earth / Swiss oblique mercator / Krovak / NZMG:
    // emit -> parse -> transform-identical. The Bessel-based Swiss grid
    // is the regression that motivated serializing semi_major_axis /
    // inverse_flattening: without them it re-parsed as WGS84, ~100-200 m
    // off; with them the roundtrip is exact
    for ((crs, pt, tol) <- Seq(
        (Crs.modisSinusoidal, (45.3, -23.0), 1e-9),
        (Crs.fromString("EPSG:8858"), (-100.0, 40.0), 1e-9),
        (Crs.ch1903Lv03, (8.5417, 47.3769), 1e-9),
        (Crs.ch1903PlusLv95, (6.15, 46.2), 1e-9),
        (Crs.nzmg, (174.76, -36.85), 1e-9),
        (Crs.krovakEastNorth, (14.4208, 50.0875), 1e-9))) {
      val parsed = CfConv.crsFromAttrs(CfConv.crsToAttrs(crs)).get
      val (x1, y1) = crs.fromLonLat(pt._1, pt._2)
      val (x2, y2) = parsed.fromLonLat(pt._1, pt._2)
      assert(math.abs(x1 - x2) < tol && math.abs(y1 - y2) < tol,
        s"${crs.name}: ($x1,$y1) vs ($x2,$y2)")
    }
    // datum-shifted grids carry the CF `towgs84` Bursa-Wolf attribute
    // and round-trip wrapper-exact (not just projection-exact): the
    // re-parsed CRS applies the same Helmert chain, so WGS84 lon/lat
    // agrees to 1e-9 — no 100-200 m datum skew can hide in the attrs
    for ((code, pt) <- Seq(
        ("EPSG:5514", (14.4208, 50.0875)), ("EPSG:21781", (8.5417, 47.3769)),
        ("EPSG:27200", (174.76, -36.85)), ("EPSG:27700", (-0.1276, 51.5072)))) {
      val crs = Crs.fromString(code).asInstanceOf[Crs.DatumShifted]
      val attrs = CfConv.crsToAttrs(crs)
      assert(attrs.contains("towgs84"), s"$code attrs missing towgs84")
      val parsed = CfConv.crsFromAttrs(attrs).get
      assert(parsed.isInstanceOf[Crs.DatumShifted], s"$code re-parse lost the datum")
      val (x1, y1) = crs.fromLonLat(pt._1, pt._2)
      val (x2, y2) = parsed.fromLonLat(pt._1, pt._2)
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9,
        s"$code: ($x1,$y1) vs ($x2,$y2)")
      val (l1, p1) = crs.toLonLat(x1, y1)
      val (l2, p2) = parsed.toLonLat(x1, y1)
      assert(math.abs(l1 - l2) < 1e-9 && math.abs(p1 - p2) < 1e-9)
    }
    // ADVICE r6: semi_major_axis alone (no inverse_flattening) is CF's
    // spherical-earth spelling — must parse as a sphere, not fall back
    // to the family default ellipsoid
    val sphereOnly = CfConv.crsFromAttrs(Map(
      "grid_mapping_name" -> "lambert_azimuthal_equal_area",
      "longitude_of_projection_origin" -> "10.0",
      "latitude_of_projection_origin" -> "52.0",
      "semi_major_axis" -> "6371000.0")).get
    val sphereExplicit = CfConv.crsFromAttrs(Map(
      "grid_mapping_name" -> "lambert_azimuthal_equal_area",
      "longitude_of_projection_origin" -> "10.0",
      "latitude_of_projection_origin" -> "52.0",
      "semi_major_axis" -> "6371000.0",
      "inverse_flattening" -> "0")).get
    val (sx1, sy1) = sphereOnly.fromLonLat(12.0, 50.0)
    val (sx2, sy2) = sphereExplicit.fromLonLat(12.0, 50.0)
    assert(math.abs(sx1 - sx2) < 1e-9 && math.abs(sy1 - sy2) < 1e-9,
      s"semi_major-only must be the same sphere: ($sx1,$sy1) vs ($sx2,$sy2)")
    val (gx1, gy1) = Crs.LambertAzimuthalEqualArea(10.0, 52.0, 0.0, 0.0, Crs.GRS80, "grs80")
      .fromLonLat(12.0, 50.0)
    assert(math.hypot(sx1 - gx1, sy1 - gy1) > 100.0,
      "sphere must NOT silently be the GRS80 family default")
    // genuinely oblique azimuth refuses loudly
    intercept[IllegalArgumentException](CfConv.crsFromAttrs(Map(
      "grid_mapping_name" -> "oblique_mercator",
      "azimuth_of_central_line" -> "53.3")))
    // CF spherical-earth convention: inverse_flattening = 0 means a
    // SPHERE (WRF et al.), not f = 1/0 — coordinates must stay finite
    val wrfSphere = CfConv.crsFromAttrs(Map(
      "grid_mapping_name" -> "lambert_conformal_conic",
      "standard_parallel" -> "[30.0, 60.0]",
      "latitude_of_projection_origin" -> "40.0",
      "longitude_of_central_meridian" -> "-97.0",
      "semi_major_axis" -> "6370000.0",
      "inverse_flattening" -> "0")).get
    val (wx2, wy2) = wrfSphere.fromLonLat(-97.0, 40.0)
    assert(java.lang.Double.isFinite(wx2) && java.lang.Double.isFinite(wy2),
      s"spherical LCC produced ($wx2,$wy2)")
    val (wl, wp) = wrfSphere.toLonLat(wx2, wy2)
    assert(math.abs(wl - -97.0) < 1e-7 && math.abs(wp - 40.0) < 1e-7)
    // CF single-value standard_parallel accepted for LCC
    val oneSp = CfConv.crsFromAttrs(Map(
      "grid_mapping_name" -> "lambert_conformal_conic",
      "standard_parallel" -> "45.0", "longitude_of_central_meridian" -> "3.0")).get
    oneSp match {
      case l: Crs.LambertConformalConic => assert(l.lat1Deg == 45.0 && l.lat2Deg == 45.0)
      case other => fail(s"$other")
    }
  }

  test("new EPSG shorthands resolve and rotated-pole grids report degree axes") {
    assert(Crs.fromString("EPSG:3857") == Crs.WebMercator)
    assert(Crs.fromString("EPSG:2154").name == "EPSG:2154")
    assert(Crs.fromString("EPSG:3413").name == "EPSG:3413")
    assert(Crs.fromString("EPSG:3031").name == "EPSG:3031")
    val gmRot = graft.geom.GridMapping.regular(4, 4, 0.0, 0.0, 0.1, 0.1,
      Crs.RotatedPole(32.5, -170.0, 0.0, "rotated"))
    assert(gmRot.spatialUnitName == "degree")
    val gmUtm = graft.geom.GridMapping.regular(4, 4, 0.0, 0.0, 10.0, 10.0,
      Crs.utm(32, north = true))
    assert(gmUtm.spatialUnitName == "metre")
  }
}
