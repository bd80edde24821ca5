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
}
