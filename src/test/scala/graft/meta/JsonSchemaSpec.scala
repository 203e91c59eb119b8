package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import graft.meta.Model._

/** V1 — schema validation against the vendored OME-NGFF JSON Schemas
  * (the exact files the reference packages; its
  * `py/test/test_ngff_validation.py` runs written stores through the
  * same documents). Valid cases: graft's own attrs writers for 0.4
  * and 0.5 plus HCS plate/well attrs. Invalid cases exercise each
  * keyword family the schemas rely on — required, enum, minItems,
  * maxItems/maxContains, contains, oneOf — and the strict_ variants'
  * extra `required` overlay.
  */
class JsonSchemaSpec extends AnyFunSuite {

  private val axes = Seq(
    Axis("y", "space", Some("micrometer")), Axis("x", "space", Some("micrometer")))
  private val ms = MultiscalesMeta(
    axes,
    Seq(
      DatasetMeta("scale0/image", Seq(ScaleT(Seq(1.0, 1.0)), TranslationT(Seq(0.0, 0.0)))),
      DatasetMeta("scale1/image", Seq(ScaleT(Seq(2.0, 2.0)), TranslationT(Seq(0.5, 0.5))))),
    version = "0.4", name = Some("image"),
    `type` = Some("itkwasm_bin_shrink"),
    metadata = Some(Method.ItkwasmBinShrink.metadata))

  test("graft-written 0.4 attrs validate against image schema, also strict") {
    val json = ZarrJson.rootAttrs(ms)
    assert(Validation.validateSchema(json, "0.4") == Nil)
    // strict overlays required [version, metadata, type, name] per entry
    assert(Validation.validateSchema(json, "0.4", strict = true) == Nil)
  }

  test("graft-written 0.5 attrs validate (cross-document _version ref)") {
    val json = ZarrJson.rootAttrs(ms.copy(version = "0.5"))
    assert(Validation.validateSchema(json, "0.5") == Nil)
    assert(Validation.validateSchema(json, "0.5", strict = true) == Nil)
  }

  test("strict catches what non-strict allows: missing type/metadata") {
    val bare = ms.copy(`type` = None, metadata = None, name = None)
    val json = ZarrJson.rootAttrs(bare)
    assert(Validation.validateSchema(json, "0.4") == Nil)
    val errs = Validation.validateSchema(json, "0.4", strict = true)
    assert(errs.exists(_.message.contains("'type'")))
    assert(errs.exists(_.message.contains("'metadata'")))
    assert(errs.exists(_.message.contains("'name'")))
  }

  test("missing multiscales / empty datasets / missing axes") {
    assert(Validation.validateSchema("""{}""", "0.4")
      .exists(_.message.contains("'multiscales'")))
    assert(Validation.validateSchema(
      """{"multiscales":[{"axes":[{"name":"y","type":"space"},{"name":"x","type":"space"}],
         "datasets":[]}]}""", "0.4")
      .exists(_.message.contains("minItems")))
    assert(Validation.validateSchema(
      """{"multiscales":[{"datasets":[{"path":"0","coordinateTransformations":
         [{"type":"scale","scale":[1,1]}]}]}]}""", "0.4")
      .exists(_.message.contains("'axes'")))
  }

  test("axes constraints: maxItems 5, spatial-count window via contains") {
    def doc(axs: String) =
      s"""{"multiscales":[{"axes":$axs,"datasets":[
          {"path":"0","coordinateTransformations":[{"type":"scale","scale":[1,1]}]}]}]}"""
    val six = (1 to 6).map(i => s"""{"name":"d$i","type":"space"}""").mkString("[", ",", "]")
    assert(Validation.validateSchema(doc(six), "0.4").exists(_.message.contains("maxItems")))
    // four space axes exceed maxContains 3
    val four = Seq("z1", "z2", "y", "x")
      .map(n => s"""{"name":"$n","type":"space"}""").mkString("[", ",", "]")
    assert(Validation.validateSchema(doc(four), "0.4").exists(_.message.contains("maxContains")))
    // one space axis is under minContains 2
    val one = """[{"name":"t","type":"time"},{"name":"x","type":"space"}]"""
    assert(Validation.validateSchema(doc(one), "0.4").exists(_.message.contains("minContains")))
    // custom axis type rides the second oneOf branch: name only is fine
    val custom = """[{"name":"y","type":"space"},{"name":"x","type":"space"},{"name":"p","type":"parameter"}]"""
    assert(Validation.validateSchema(doc(custom), "0.4") == Nil)
    // but a custom-typed axis claiming "space" with no unit key is the
    // first branch; "space" with an extra property set is still fine —
    // invalid is a non-string name
    val badName = """[{"name":3,"type":"space"},{"name":"x","type":"space"}]"""
    assert(Validation.validateSchema(doc(badName), "0.4").nonEmpty)
  }

  test("coordinateTransformations: scale required, at most one, rank >= 2") {
    def doc(cts: String) =
      s"""{"multiscales":[{"axes":[{"name":"y","type":"space"},{"name":"x","type":"space"}],
          "datasets":[{"path":"0","coordinateTransformations":$cts}]}]}"""
    assert(Validation.validateSchema(doc("""[{"type":"translation","translation":[0,0]}]"""),
      "0.4").exists(_.message.contains("contains")))
    assert(Validation.validateSchema(
      doc("""[{"type":"scale","scale":[1,1]},{"type":"scale","scale":[2,2]}]"""),
      "0.4").exists(_.message.contains("maxContains")))
    assert(Validation.validateSchema(doc("""[{"type":"scale","scale":[1]}]"""),
      "0.4").nonEmpty)
    assert(Validation.validateSchema(doc("""[{"type":"scale","scale":[1,1]},
      {"type":"translation","translation":[0.5,0.5]}]"""), "0.4") == Nil)
  }

  test("version enum: 0.4 schema rejects other versions") {
    val json = """{"multiscales":[{"version":"0.3",
      "axes":[{"name":"y","type":"space"},{"name":"x","type":"space"}],
      "datasets":[{"path":"0","coordinateTransformations":[{"type":"scale","scale":[1,1]}]}]}]}"""
    assert(Validation.validateSchema(json, "0.4").exists(_.message.contains("enum")))
  }

  test("omero channels: window + color required") {
    val json = """{"multiscales":[{"axes":[{"name":"y","type":"space"},{"name":"x","type":"space"}],
      "datasets":[{"path":"0","coordinateTransformations":[{"type":"scale","scale":[1,1]}]}]}],
      "omero":{"channels":[{"label":"c0"}]}}"""
    val errs = Validation.validateSchema(json, "0.4")
    assert(errs.exists(_.message.contains("'window'")))
    assert(errs.exists(_.message.contains("'color'")))
  }

  test("HCS plate and well attrs validate; malformed ones don't") {
    import graft.hcs.Hcs.{plateAttrs, wellAttrs}
    val plate = Plate(
      rows = Seq(PlateRow("A"), PlateRow("B")),
      columns = Seq(PlateColumn("1"), PlateColumn("2")),
      wells = Seq(PlateWellIndex("A/1", 0, 0), PlateWellIndex("B/2", 1, 1)),
      name = Some("p"),
      acquisitions = Seq(PlateAcquisition(0, Some("a0"))),
      field_count = Some(1))
    assert(Validation.validateSchema(plateAttrs(plate), "0.4", model = "plate") == Nil)
    val well = Well(Seq(WellImage("0", Some(0)), WellImage("1", Some(0))), "0.4")
    assert(Validation.validateSchema(wellAttrs(well), "0.4", model = "well") == Nil)
    // well image paths must be relative alphanumerics; acquisition ids integers
    assert(Validation.validateSchema(
      """{"well":{"images":[{"path":"../escape"}]}}""", "0.4", model = "well").nonEmpty)
    assert(Validation.validateSchema(
      """{"plate":{"columns":[{"name":"no spaces"}],"rows":[{"name":"A"}],
         "wells":[{"path":"A/1","rowIndex":0,"columnIndex":0}]}}""",
      "0.4", model = "plate").exists(_.message.contains("pattern")))
  }

  test("0.1 through 0.3 schemas load and validate a versioned doc") {
    // 0.1-0.3 have no axes objects (names only land in 0.3's list form)
    val v01 = """{"multiscales":[{"datasets":[{"path":"0"}],"version":"0.1"}]}"""
    assert(Validation.validateSchema(v01, "0.1") == Nil)
    val v03 = """{"multiscales":[{"datasets":[{"path":"0"}],"version":"0.3",
      "axes":["t","y","x"]}]}"""
    assert(Validation.validateSchema(v03, "0.3") == Nil)
  }

  test("RFC 4 orientation $defs: shape and 18-member value enum") {
    val schema = JsonSchema.loadRfc4Schema()
    val orientation = schema.get("$defs").get("AnatomicalOrientation")
    assert(JsonSchema.validate(orientation,
      """{"type":"anatomical","value":"left-to-right"}""") == Nil)
    assert(JsonSchema.validate(orientation, """{"type":"anatomical"}""")
      .exists(_.message.contains("'value'")))
    assert(JsonSchema.validate(orientation,
      """{"type":"anatomical","value":"x","extra":1}""")
      .exists(_.message.contains("additional property")))
    val values = schema.get("$defs").get("AnatomicalOrientationValues")
    assert(JsonSchema.validate(values, "\"rostral-to-caudal\"") == Nil)
    assert(JsonSchema.validate(values, "\"up-to-down\"").nonEmpty)
    // the enum in the vendored schema and the hand registry agree
    val enumVals = values.get("enum").elements()
    val fromSchema = Iterator.continually(enumVals)
      .takeWhile(_.hasNext).map(_.next().asText()).toSet
    assert(fromSchema == Model.AnatomicalOrientationValues.toSet)
  }

  test("read-path validate=true rejects a schema-invalid store") {
    // exercised indirectly: Validation.validateSchema is wired into
    // OmeZarrIO.readMultiscales(validate = true); a structural failure
    // there already has coverage — here pin the wiring contract
    assert(Validation.SchemaVersions == Set("0.1", "0.2", "0.3", "0.4", "0.5"))
  }
}
