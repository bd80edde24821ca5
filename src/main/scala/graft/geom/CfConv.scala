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

  /** kind: "geographic" (lon/lat), "rotated" (rlon/rlat,
    * grid_longitude/grid_latitude), or "projected" (x/y, xc/yc, ...) —
    * drives CRS pairing like the reference's three GridCoords buckets
    * (reference: cfconv.py:119-163).
    */
  final case class CoordVars(xName: String, yName: String, is2D: Boolean, kind: String = "geographic")
  final case class Candidate(crs: Crs, coords: CoordVars, gmVarName: Option[String])

  /** CF grid-mapping attrs -> Crs. Supports the families the engine
    * implements; unknown names raise.
    */
  def crsFromAttrs(attrs: Attrs): Option[Crs] = {
    def num(k: String): Option[Double] = attrs.get(k).flatMap(v => v.toDoubleOption)
    // CF defines semi_major_axis / inverse_flattening on grid-mapping
    // variables: when both are present they override the family's
    // default ellipsoid, so Bessel-based grids (Swiss somerc, Krovak)
    // round-trip through their own attrs instead of silently becoming
    // WGS84 (a ~100-200 m shift)
    def ellOr(default: Crs.Ellipsoid): Crs.Ellipsoid =
      (num("semi_major_axis"), num("inverse_flattening")) match {
        case (Some(a), Some(invF)) =>
          // CF encodes a SPHERICAL earth as inverse_flattening = 0
          // (WRF et al.); taken literally it would mean f = 1/0 and
          // NaN coordinates everywhere. invF = +inf gives f = 0 — the
          // sphere the convention intends.
          Crs.Ellipsoid(a, if (invF == 0.0) Double.PositiveInfinity else invF)
        // semi_major_axis WITHOUT inverse_flattening is CF's other
        // spherical-earth spelling (equivalent to earth_radius) — a
        // sphere, not the family's default ellipsoid
        case (Some(a), None) => Crs.Ellipsoid(a, Double.PositiveInfinity)
        case _ => default
      }
    // CF grid-mapping `towgs84` attribute (appendix F: 3/6/7-value
    // Bursa-Wolf parameters, position-vector) wraps the projection in
    // the Helmert datum shift
    def datumOr(crs: Crs): Crs = {
      val tow = attrs.get("towgs84").toSeq
        .flatMap(_.split("[,\\[\\]\\s]+")).flatMap(_.toDoubleOption)
      if (tow.nonEmpty && tow.exists(_ != 0.0)) {
        val p = tow.padTo(7, 0.0)
        Crs.DatumShifted(crs, Crs.Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6)))
      } else crs
    }
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
              ell = ellOr(Crs.WGS84), name = "CF:transverse_mercator")
          case "lambert_azimuthal_equal_area" =>
            Crs.LambertAzimuthalEqualArea(
              lon0Deg = num("longitude_of_projection_origin").getOrElse(0.0),
              lat0Deg = num("latitude_of_projection_origin").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.GRS80), name = "CF:laea")
          case "lambert_cylindrical_equal_area" =>
            Crs.CylindricalEqualArea(
              latTsDeg = num("standard_parallel").getOrElse(0.0),
              lon0Deg = num("longitude_of_central_meridian").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.WGS84), name = "CF:cea")
          case "rotated_latitude_longitude" =>
            Crs.RotatedPole(
              poleLatDeg = num("grid_north_pole_latitude").getOrElse(90.0),
              poleLonDeg = num("grid_north_pole_longitude").getOrElse(0.0),
              axisLonDeg = num("north_pole_grid_longitude").getOrElse(0.0),
              name = "CF:rotated_pole")
          case "lambert_conformal_conic" =>
            // CF standard_parallel is one value or two (serialized
            // "44.0" or "[44.0, 49.0]")
            val sps = attrs.get("standard_parallel").toSeq
              .flatMap(_.split("[,\\[\\]\\s]+")).flatMap(_.toDoubleOption)
            val sp1 = sps.headOption.getOrElse(0.0)
            val sp2 = sps.lift(1).getOrElse(sp1)
            Crs.LambertConformalConic(
              lat1Deg = sp1, lat2Deg = sp2,
              lat0Deg = num("latitude_of_projection_origin").getOrElse(0.0),
              lon0Deg = num("longitude_of_central_meridian").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.WGS84), name = "CF:lcc")
          case "albers_conical_equal_area" =>
            val sps = attrs.get("standard_parallel").toSeq
              .flatMap(_.split("[,\\[\\]\\s]+")).flatMap(_.toDoubleOption)
            val sp1 = sps.headOption.getOrElse(0.0)
            val sp2 = sps.lift(1).getOrElse(sp1)
            Crs.AlbersEqualAreaConic(
              lat1Deg = sp1, lat2Deg = sp2,
              lat0Deg = num("latitude_of_projection_origin").getOrElse(0.0),
              lon0Deg = num("longitude_of_central_meridian").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.WGS84), name = "CF:albers")
          case "polar_stereographic" =>
            val lat0 = num("latitude_of_projection_origin").getOrElse(90.0)
            Crs.PolarStereographic(
              latTsDeg = num("standard_parallel").getOrElse(lat0),
              lon0Deg = num("straight_vertical_longitude_from_pole").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              south = lat0 < 0, ell = ellOr(Crs.WGS84), name = "CF:polar_stereographic")
          case "sinusoidal" =>
            val r = num("earth_radius").getOrElse(throw new IllegalArgumentException(
              "CF sinusoidal is implemented for the SPHERICAL form only: earth_radius required"))
            Crs.Sinusoidal(
              lon0Deg = num("longitude_of_projection_origin").getOrElse(0.0),
              radius = r,
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              name = "CF:sinusoidal")
          case "equal_earth" =>
            Crs.EqualEarth(
              lon0Deg = num("longitude_of_projection_origin").getOrElse(0.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.WGS84), name = "CF:equal_earth")
          case "oblique_mercator" =>
            val az = num("azimuth_of_central_line").getOrElse(90.0)
            if (az != 90.0) throw new IllegalArgumentException(
              s"oblique_mercator is implemented for azimuth 90 (the Swiss somerc form) only, got $az")
            Crs.SwissObliqueMercator(
              lon0Deg = num("longitude_of_projection_origin").getOrElse(0.0),
              lat0Deg = num("latitude_of_projection_origin").getOrElse(0.0),
              k0 = num("scale_factor_at_projection_origin").getOrElse(1.0),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.WGS84), name = "CF:oblique_mercator")
          case "krovak" =>
            Crs.Krovak(
              lonCDeg = num("longitude_of_center").getOrElse(24.0 + 50.0 / 60),
              latCDeg = num("latitude_of_center").getOrElse(49.5),
              azimuthDeg = num("azimuth_of_central_line")
                .getOrElse(30.0 + 17.0 / 60 + 17.3031 / 3600),
              latPseudoDeg = num("pseudo_standard_parallel").getOrElse(78.5),
              kP = num("scale_factor_on_pseudo_standard_parallel").getOrElse(0.9999),
              falseEasting = num("false_easting").getOrElse(0.0),
              falseNorthing = num("false_northing").getOrElse(0.0),
              ell = ellOr(Crs.Bessel1841), name = "CF:krovak")
          case "mercator" => Crs.WebMercator
          // CF has no NZMG entry; all constants are fixed by the
          // published definition, so the name alone round-trips
          case "new_zealand_map_grid" => Crs.nzmg
          case other =>
            throw new IllegalArgumentException(s"unsupported grid_mapping_name: $other")
        }.map(datumOr)
    }
  }

  private val XStandardNames = Map(
    "longitude" -> "geographic", "grid_longitude" -> "rotated",
    "projection_x_coordinate" -> "projected")
  private val YStandardNames = Map(
    "latitude" -> "geographic", "grid_latitude" -> "rotated",
    "projection_y_coordinate" -> "projected")
  private val XNamePairs = Seq(
    ("lon", "lat", "geographic"), ("x", "y", "projected"), ("xc", "yc", "projected"),
    ("rlon", "rlat", "rotated"), ("transformed_x", "transformed_y", "projected"),
    ("longitude", "latitude", "geographic"))

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
    val xByStd = usable.filter(v => std(v).exists(XStandardNames.contains)).toSeq.sorted
    val yByStd = usable.filter(v => std(v).exists(YStandardNames.contains)).toSeq.sorted

    val stdPairs = for {
      x <- xByStd; y <- yByStd
      if XStandardNames(std(x).get) == YStandardNames(std(y).get) &&
        varDims(x).length == varDims(y).length &&
        (varDims(x).length == 1 || varDims(x) == varDims(y))
    } yield CoordVars(x, y, varDims(x).length == 2, XStandardNames(std(x).get))

    if (stdPairs.nonEmpty) stdPairs
    else XNamePairs.flatMap { case (xn, yn, kind) =>
      if (usable.contains(xn) && usable.contains(yn) &&
          varDims(xn).length == varDims(yn).length)
        Some(CoordVars(xn, yn, varDims(xn).length == 2, kind))
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
      // each coord kind pairs with its CRS bucket (reference's three
      // GridCoords buckets, cfconv.py:158-163): lon/lat <-> geographic,
      // rlon/rlat <-> rotated_latitude_longitude, x/y <-> projected;
      // missing CRS -> WGS84 default for lon/lat only
      val matching = p.kind match {
        case "geographic" => crss.find { case (_, c) => c.isGeographic }
        case "rotated" => crss.find { case (_, c) => c.isInstanceOf[Crs.RotatedPole] }
        case _ => crss.find { case (_, c) =>
          !c.isGeographic && !c.isInstanceOf[Crs.RotatedPole] }
      }
      matching match {
        case Some((name, c)) => Some(Candidate(c, p, Some(name)))
        case None if p.kind == "geographic" => Some(Candidate(Crs.Geographic, p, None))
        case None => None
      }
    }
    cands.flatten
  }

  /** Identify the horizontal spatial dimension pair, in (x, y) order —
    * ("lon","lat") preferred over ("x","y"); anything else raises, like
    * the reference's KeyError (reference: utils.py:47-74).
    */
  def getSpatialDims(names: Set[String]): (String, String) =
    if (names.contains("lat") && names.contains("lon")) ("lon", "lat")
    else if (names.contains("y") && names.contains("x")) ("x", "y")
    else throw new NoSuchElementException(
      "No standard spatial dimensions found in dataset. Expected pairs " +
      s"('lon', 'lat') or ('x', 'y'), but found: ${names.toSeq.sorted.mkString(", ")}.")

  /** Collect the grid-mapping variable name: every data var's
    * `grid_mapping` attr plus present `crs`/`spatial_ref` vars must
    * agree on at most ONE distinct name — a malformed dataset raises
    * instead of mis-inferring silently (reference: utils.py:164-178).
    */
  def getGridMappingName(
      varAttrs: Map[String, Attrs], varNames: Set[String]): Option[String] = {
    val referenced = varAttrs.values.flatMap(_.get("grid_mapping"))
    val present = Seq("crs", "spatial_ref").filter(varNames.contains)
    val names = (referenced ++ present).toSet
    require(names.size <= 1,
      s"Multiple grid mapping names found: ${names.toSeq.sorted.mkString(", ")}.")
    names.headOption
  }

  /** Emit CF grid-mapping attributes for a CRS — the inverse of
    * [[crsFromAttrs]] (the reference serializes via pyproj `to_cf`,
    * cfconv.py:215-221).
    */
  def crsToAttrs(crs: Crs): Attrs = crs match {
    // datum-shifted grids serialize the base projection's attrs plus
    // the CF `towgs84` Bursa-Wolf parameter list, and round-trip
    // through the datumOr hook in crsFromAttrs
    case d: Crs.DatumShifted =>
      val h = d.helmert
      crsToAttrs(d.base) + ("towgs84" ->
        s"[${h.dx}, ${h.dy}, ${h.dz}, ${h.rxSec}, ${h.rySec}, ${h.rzSec}, ${h.dsPpm}]")
    case Crs.Geographic => Map("grid_mapping_name" -> "latitude_longitude")
    // CF grid_mapping attrs carry no linear-unit slot; writing a ftUS
    // grid as if its coords were metres would silently corrupt every
    // consumer, so fail loudly — convert to the metre base first
    case u: Crs.UnitScaled => throw new IllegalArgumentException(
      s"CF grid_mapping serialization is metre-based; ${u.name} uses " +
        s"'${u.axisUnit}' — transform the grid to its metre twin (${u.base.name}) first")
    case t: Crs.TransverseMercator => Map(
      "grid_mapping_name" -> "transverse_mercator",
      "longitude_of_central_meridian" -> t.lon0Deg.toString,
      "latitude_of_projection_origin" -> t.lat0Deg.toString,
      "scale_factor_at_central_meridian" -> t.k0.toString,
      "false_easting" -> t.falseEasting.toString,
      "false_northing" -> t.falseNorthing.toString,
      "semi_major_axis" -> t.ell.a.toString,
      "inverse_flattening" -> t.ell.invF.toString,
      "crs_name" -> t.name)
    case l: Crs.LambertAzimuthalEqualArea => Map(
      "grid_mapping_name" -> "lambert_azimuthal_equal_area",
      "longitude_of_projection_origin" -> l.lon0Deg.toString,
      "latitude_of_projection_origin" -> l.lat0Deg.toString,
      "false_easting" -> l.falseEasting.toString,
      "false_northing" -> l.falseNorthing.toString,
      "semi_major_axis" -> l.ell.a.toString,
      "inverse_flattening" -> l.ell.invF.toString,
      "crs_name" -> l.name)
    case r: Crs.RotatedPole => Map(
      "grid_mapping_name" -> "rotated_latitude_longitude",
      "grid_north_pole_latitude" -> r.poleLatDeg.toString,
      "grid_north_pole_longitude" -> r.poleLonDeg.toString,
      "north_pole_grid_longitude" -> r.axisLonDeg.toString,
      "crs_name" -> r.name)
    case l: Crs.LambertConformalConic => Map(
      "grid_mapping_name" -> "lambert_conformal_conic",
      "standard_parallel" -> s"[${l.lat1Deg}, ${l.lat2Deg}]",
      "latitude_of_projection_origin" -> l.lat0Deg.toString,
      "longitude_of_central_meridian" -> l.lon0Deg.toString,
      "false_easting" -> l.falseEasting.toString,
      "false_northing" -> l.falseNorthing.toString,
      "semi_major_axis" -> l.ell.a.toString,
      "inverse_flattening" -> l.ell.invF.toString,
      "crs_name" -> l.name)
    case a: Crs.AlbersEqualAreaConic => Map(
      "grid_mapping_name" -> "albers_conical_equal_area",
      "standard_parallel" -> s"[${a.lat1Deg}, ${a.lat2Deg}]",
      "latitude_of_projection_origin" -> a.lat0Deg.toString,
      "longitude_of_central_meridian" -> a.lon0Deg.toString,
      "false_easting" -> a.falseEasting.toString,
      "false_northing" -> a.falseNorthing.toString,
      "semi_major_axis" -> a.ell.a.toString,
      "inverse_flattening" -> a.ell.invF.toString,
      "crs_name" -> a.name)
    case c: Crs.CylindricalEqualArea => Map(
      "grid_mapping_name" -> "lambert_cylindrical_equal_area",
      "standard_parallel" -> c.latTsDeg.toString,
      "longitude_of_central_meridian" -> c.lon0Deg.toString,
      "false_easting" -> c.falseEasting.toString,
      "false_northing" -> c.falseNorthing.toString,
      "semi_major_axis" -> c.ell.a.toString,
      "inverse_flattening" -> c.ell.invF.toString,
      "crs_name" -> c.name)
    case p: Crs.PolarStereographic => Map(
      "grid_mapping_name" -> "polar_stereographic",
      "latitude_of_projection_origin" -> (if (p.south) "-90.0" else "90.0"),
      "standard_parallel" -> p.latTsDeg.toString,
      "straight_vertical_longitude_from_pole" -> p.lon0Deg.toString,
      "false_easting" -> p.falseEasting.toString,
      "false_northing" -> p.falseNorthing.toString,
      "semi_major_axis" -> p.ell.a.toString,
      "inverse_flattening" -> p.ell.invF.toString,
      "crs_name" -> p.name)
    case s: Crs.Sinusoidal => Map(
      "grid_mapping_name" -> "sinusoidal",
      "longitude_of_projection_origin" -> s.lon0Deg.toString,
      "earth_radius" -> s.radius.toString,
      "false_easting" -> s.falseEasting.toString,
      "false_northing" -> s.falseNorthing.toString,
      "crs_name" -> s.name)
    // CF 1.9 has no equal_earth entry; pyproj serializes the PROJ name
    case e: Crs.EqualEarth => Map(
      "grid_mapping_name" -> "equal_earth",
      "longitude_of_projection_origin" -> e.lon0Deg.toString,
      "false_easting" -> e.falseEasting.toString,
      "false_northing" -> e.falseNorthing.toString,
      "semi_major_axis" -> e.ell.a.toString,
      "inverse_flattening" -> e.ell.invF.toString,
      "crs_name" -> e.name)
    case s: Crs.SwissObliqueMercator => Map(
      "grid_mapping_name" -> "oblique_mercator",
      "azimuth_of_central_line" -> "90.0",
      "latitude_of_projection_origin" -> s.lat0Deg.toString,
      "longitude_of_projection_origin" -> s.lon0Deg.toString,
      "scale_factor_at_projection_origin" -> s.k0.toString,
      "false_easting" -> s.falseEasting.toString,
      "false_northing" -> s.falseNorthing.toString,
      "semi_major_axis" -> s.ell.a.toString,
      "inverse_flattening" -> s.ell.invF.toString,
      "crs_name" -> s.name)
    // CF has no Krovak entry; "krovak" mirrors PROJ's method name and
    // round-trips through crsFromAttrs (pyproj falls back to crs_wkt)
    case k: Crs.Krovak => Map(
      "grid_mapping_name" -> "krovak",
      "longitude_of_center" -> k.lonCDeg.toString,
      "latitude_of_center" -> k.latCDeg.toString,
      "azimuth_of_central_line" -> k.azimuthDeg.toString,
      "pseudo_standard_parallel" -> k.latPseudoDeg.toString,
      "scale_factor_on_pseudo_standard_parallel" -> k.kP.toString,
      "false_easting" -> k.falseEasting.toString,
      "false_northing" -> k.falseNorthing.toString,
      "semi_major_axis" -> k.ell.a.toString,
      "inverse_flattening" -> k.ell.invF.toString,
      "crs_name" -> k.name)
    case Crs.WebMercator => Map(
      "grid_mapping_name" -> "mercator",
      "crs_name" -> Crs.WebMercator.name)
    case n: Crs.NewZealandMapGrid => Map(
      "grid_mapping_name" -> "new_zealand_map_grid",
      "crs_name" -> n.name)
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
