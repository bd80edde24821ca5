package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{CfConv, Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies
import graft.model.Policies.{U8, VarPolicy}

/** Categorical (uint8 flag) downsampling — the cci_lccs_class shape
  * (reference fixture: sampledata.py:453-506): integer dtype defaults
  * to nearest interp + center agg; mode aggregation picks the most
  * frequent class with a min-value tie-break; fill is 255.
  */
class CategoricalSpec extends AnyFunSuite {

  // 4x4 landcover classes
  val classes = Array(
    Array(10.0, 10.0, 20.0, 20.0),
    Array(10.0, 30.0, 20.0, 20.0),
    Array(40.0, 40.0, 50.0, 60.0),
    Array(40.0, 40.0, 60.0, 50.0))
  val srcGm = GridMapping.regular(4, 4, 0.0, 0.0, 1.0, 1.0, Crs.Geographic)
  val dstGm = GridMapping.regular(2, 2, 0.0, 0.0, 2.0, 2.0, Crs.Geographic)

  def policy(agg: Reducers.Method): Map[String, VarPolicy] =
    Map("lccs" -> VarPolicy(Interp.BILINEAR, agg, recoverNan = false,
      fill = Policies.defaultFill(U8), dtype = U8))

  test("uint8 defaults: nearest interp, center agg, fill 255") {
    val p = Policies.resolve("lccs", U8)
    assert(p.interp == Interp.NEAREST && p.agg == Reducers.Center && p.fill == 255.0)
  }

  test("mode aggregation keeps dominant class per window") {
    val out = AffineOp.affineTransform(
      toDs(tilesFrom("lccs", classes, srcGm)), srcGm, dstGm, policy(Reducers.Mode))
    // windows: [10,10,10,30] -> 10 ; [20,20,20,20] -> 20 ;
    //          [40,40,40,40] -> 40 ; [50,60,60,50] -> tie -> min 50
    assertImage(toArray(out.collect().toSeq, dstGm, "lccs"), Array(
      Array(10.0, 20.0), Array(40.0, 50.0)))
  }

  test("center aggregation picks the window center pixel") {
    val out = AffineOp.affineTransform(
      toDs(tilesFrom("lccs", classes, srcGm)), srcGm, dstGm, policy(Reducers.Center))
    // center of 2x2 window = [1][1]
    assertImage(toArray(out.collect().toSeq, dstGm, "lccs"), Array(
      Array(30.0, 20.0), Array(40.0, 50.0)))
  }

  test("normalize_grid_mapping rewrites the attribute catalog") {
    val attrs = Map(
      "lccs" -> Map("grid_mapping" -> "transverse_mercator", "flag_values" -> "10 20 30"),
      "transverse_mercator" -> Map("grid_mapping_name" -> "transverse_mercator"),
      "lon" -> Map("standard_name" -> "longitude"))
    val out = CfConv.normalizeGridMapping(attrs, Set("lccs"), Crs.Geographic)
    assert(!out.contains("transverse_mercator"))
    assert(out("spatial_ref")("grid_mapping_name") == "latitude_longitude")
    assert(out("lccs")("grid_mapping") == "spatial_ref")
    assert(out("lccs")("flag_values") == "10 20 30") // other attrs kept
    // roundtrip: emitted attrs parse back to the same CRS family
    val crs = CfConv.crsFromAttrs(out("spatial_ref")).get
    assert(crs.isGeographic)
    val laeaAttrs = CfConv.crsToAttrs(Crs.laea3035)
    assert(CfConv.crsFromAttrs(laeaAttrs).get.asInstanceOf[Crs.LambertAzimuthalEqualArea].lon0Deg == 10.0)
  }
}
