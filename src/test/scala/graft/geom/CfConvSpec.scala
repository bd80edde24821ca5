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
    assert(chosen.coords == CfConv.CoordVars("x", "y", is2D = false))
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
