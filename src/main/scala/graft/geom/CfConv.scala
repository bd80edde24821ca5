package graft.geom

/** CF-convention grid-mapping discovery — the Spark home of
  * `GridMapping.from_dataset` / `get_dataset_grid_mapping_proxies`
  * (reference: xcube_resampling/gridmapping/dataset.py:31-102,
  * cfconv.py:66-212).
  *
  * The engine's dataset format carries variable/dataset attributes as
  * plain maps (a JSON side table next to the parquet tiles); this
  * module consumes those maps. Pipeline:
  *
  *  1. find grid-mapping variables: any var whose attrs carry a CF
  *     `grid_mapping_name` (or `crs_wkt`/`spatial_ref`), plus vars
  *     POINTED AT by other vars' `grid_mapping` attr
  *  2. resolve each to a [[Crs]] (EPSG code, CF name + params)
  *  3. find coordinate variables by CF `standard_name`
  *     (longitude/latitude/projection_x_coordinate/...), falling back
  *     to naming conventions (lon/lat, x/y, xc/yc, transformed_x/y)
  *  4. pair coords with CRS; complement a missing CRS with WGS84 for
  *     lon/lat coords (reference: cfconv.py:196-205)
  *  5. among the candidates prefer `prefer_crs` and/or
  *     `prefer_is_regular` (reference: dataset.py:60-96)
  */
object CfConv {

  type Attrs = Map[String, String]

  final case class CoordVars(xName: String, yName: String, is2D: Boolean)
  final case class Candidate(crs: Crs, coords: CoordVars, gmVarName: Option[String])

  /** CF grid-mapping attrs -> Crs. Supports the families the engine
    * implements; unknown names raise.
    */
  def crsFromAttrs(attrs: Attrs): Option[Crs] = {
    def num(k: String): Option[Double] = attrs.get(k).flatMap(v => v.toDoubleOption)
    attrs.get("spatial_ref").orElse(attrs.get("crs_wkt")) match {
      case Some(wkt) if wkt.contains("EPSG") =>
        // accept "EPSG","NNNN" authority tails in WKT
        val epsg = "EPSG\"?,\\s*\"?(\\d+)".r.findAllMatchIn(wkt).map(_.group(1)).toSeq.lastOption
        epsg.map(code => Crs.fromString(s"EPSG:$code"))
      case _ =>
        attrs.get("grid_mapping_name").map {
          case "latitude_longitude" => Crs.Geographic
          case "transverse_mercator" =>
            Crs.TransverseMercator(
              lon0Deg = num("longitude_of_central_meridian").getOrElse(0.0),
              lat0Deg = num("latitude_of_projection_origin").getOrElse(0.0),
              k0 = num("scale_factor_at_central_meridian").getOrElse(1.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = Crs.WGS84, name = "CF:transverse_mercator")
          case "lambert_azimuthal_equal_area" =>
            Crs.LambertAzimuthalEqualArea(
              lon0Deg = num("longitude_of_projection_origin").getOrElse(0.0),
              lat0Deg = num("latitude_of_projection_origin").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = Crs.GRS80, name = "CF:laea")
          case other =>
            throw new IllegalArgumentException(s"unsupported grid_mapping_name: $other")
        }
    }
  }

  private val XStandardNames = Set("longitude", "projection_x_coordinate", "grid_longitude")
  private val YStandardNames = Set("latitude", "projection_y_coordinate", "grid_latitude")
  private val XNamePairs = Seq(
    ("lon", "lat"), ("x", "y"), ("xc", "yc"), ("rlon", "rlat"),
    ("transformed_x", "transformed_y"), ("longitude", "latitude"))

  /** Find x/y coordinate variable pairs. `varDims` maps var name ->
    * dim names (1 entry = 1D axis var, 2 = 2D coord image);
    * `varAttrs` maps var name -> attributes. Bounds vars (pointed at
    * by a `bounds` attr) are excluded (reference: cfconv.py:156-170).
    */
  def findCoordPairs(
      varDims: Map[String, Seq[String]],
      varAttrs: Map[String, Attrs]): Seq[CoordVars] = {
    val boundsVars = varAttrs.values.flatMap(_.get("bounds")).toSet
    val usable = varDims.keySet -- boundsVars

    def std(v: String): Option[String] = varAttrs.getOrElse(v, Map.empty).get("standard_name")
    val xByStd = usable.filter(v => std(v).exists(XStandardNames)).toSeq.sorted
    val yByStd = usable.filter(v => std(v).exists(YStandardNames)).toSeq.sorted

    val stdPairs = for {
      x <- xByStd; y <- yByStd
      if varDims(x).length == varDims(y).length &&
        (varDims(x).length == 1 || varDims(x) == varDims(y))
    } yield CoordVars(x, y, varDims(x).length == 2)

    if (stdPairs.nonEmpty) stdPairs
    else XNamePairs.flatMap { case (xn, yn) =>
      if (usable.contains(xn) && usable.contains(yn) &&
          varDims(xn).length == varDims(yn).length)
        Some(CoordVars(xn, yn, varDims(xn).length == 2))
      else None
    }
  }

  /** Full discovery: returns candidates ordered by preference
    * (reference: dataset.py:60-96). `dataVarAttrs` includes data vars
    * whose `grid_mapping` attr names the grid-mapping variable.
    */
  def findCandidates(
      varDims: Map[String, Seq[String]],
      varAttrs: Map[String, Attrs]): Seq[Candidate] = {
    // vars referenced by grid_mapping attrs + vars that self-describe
    val referenced = varAttrs.values.flatMap(_.get("grid_mapping")).toSet
    val gmVars = varAttrs.filter { case (name, attrs) =>
      referenced.contains(name) || attrs.contains("grid_mapping_name") ||
        attrs.contains("crs_wkt") || attrs.contains("spatial_ref") ||
        name == "crs" || name == "spatial_ref"
    }
    val crss = gmVars.flatMap { case (name, attrs) =>
      crsFromAttrs(attrs).map(c => name -> c)
    }
    val pairs = findCoordPairs(varDims, varAttrs)
    val cands = for (p <- pairs) yield {
      // geographic coords pair with a geographic CRS; projected coords
      // with a projected one; missing CRS -> WGS84 default for lon/lat
      val geographicPair = p.xName.startsWith("lon") || p.xName == "longitude" ||
        varAttrs.getOrElse(p.xName, Map.empty).get("standard_name").contains("longitude")
      val matching = crss.find { case (_, c) => c.isGeographic == geographicPair }
      matching match {
        case Some((name, c)) => Some(Candidate(c, p, Some(name)))
        case None if geographicPair => Some(Candidate(Crs.Geographic, p, None))
        case None => None
      }
    }
    cands.flatten
  }

  /** Emit CF grid-mapping attributes for a CRS — the inverse of
    * [[crsFromAttrs]] (the reference serializes via pyproj `to_cf`,
    * cfconv.py:215-221).
    */
  def crsToAttrs(crs: Crs): Attrs = crs match {
    case Crs.Geographic => Map("grid_mapping_name" -> "latitude_longitude")
    case t: Crs.TransverseMercator => Map(
      "grid_mapping_name" -> "transverse_mercator",
      "longitude_of_central_meridian" -> t.lon0Deg.toString,
      "latitude_of_projection_origin" -> t.lat0Deg.toString,
      "scale_factor_at_central_meridian" -> t.k0.toString,
      "false_easting" -> t.falseEasting.toString,
      "false_northing" -> t.falseNorthing.toString,
      "crs_name" -> t.name)
    case l: Crs.LambertAzimuthalEqualArea => Map(
      "grid_mapping_name" -> "lambert_azimuthal_equal_area",
      "longitude_of_projection_origin" -> l.lon0Deg.toString,
      "latitude_of_projection_origin" -> l.lat0Deg.toString,
      "false_easting" -> l.falseEasting.toString,
      "false_northing" -> l.falseNorthing.toString,
      "crs_name" -> l.name)
  }

  /** Normalize the grid-mapping metadata of a dataset's attribute
    * catalog: drop the old grid-mapping variable, add a scalar
    * `spatial_ref` carrying the CF CRS attrs, and point every data
    * variable's `grid_mapping` attr at it
    * (reference: utils.py:127-151).
    */
  def normalizeGridMapping(
      varAttrs: Map[String, Attrs],
      dataVars: Set[String],
      crs: Crs): Map[String, Attrs] = {
    val oldGmVars = varAttrs.collect {
      case (name, attrs) if attrs.contains("grid_mapping_name") ||
        attrs.contains("crs_wkt") || name == "crs" || name == "spatial_ref" => name
    }.toSet
    val kept = varAttrs -- oldGmVars
    val updated = kept.map { case (name, attrs) =>
      if (dataVars.contains(name)) name -> (attrs + ("grid_mapping" -> "spatial_ref"))
      else name -> (attrs - "grid_mapping")
    }
    updated + ("spatial_ref" -> crsToAttrs(crs))
  }

  /** Preference resolution (reference: dataset.py:60-96). */
  def select(
      candidates: Seq[Candidate],
      preferCrs: Option[Crs] = None,
      preferIsRegular: Boolean = true): Candidate = {
    require(candidates.nonEmpty, "no grid mapping found in dataset")
    val byCrs = preferCrs.fold(candidates)(c =>
      candidates.filter(_.crs.equalsCrs(c)) match {
        case Seq() => candidates
        case hit => hit
      })
    // 1D (potentially regular) candidates first when preferIsRegular
    val ordered =
      if (preferIsRegular) byCrs.sortBy(_.coords.is2D)
      else byCrs.sortBy(!_.coords.is2D)
    ordered.head
  }
}
