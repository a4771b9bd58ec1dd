package graft.sources

import org.apache.spark.sql.types._

/** Per-column writer property overrides — the repo analog of the
  * reference's `WriterProperties` / `ColumnProperties`
  * (`/root/reference/src/file/properties.rs:101-210`, builder usage
  * `:35-46`): a caller can pin the fallback (non-dictionary) encoding,
  * switch dictionary encoding on/off, override the block codec, and
  * enable/disable statistics, per dotted leaf column path
  * ("lang", "tags.list.element", "meta.key_value.value") or as a
  * default for every column.
  *
  * Semantics mirror the reference:
  *  - per-column value, else default-column value, else the writer-level
  *    argument (`properties.rs:168-210`'s `or_else` chains);
  *  - a pinned encoding is the FALLBACK encoding when dictionary encoding
  *    is enabled — it takes effect only for chunks the dictionary path
  *    rejects (cardinality/byte overflow), exactly `properties.rs:348-358`;
  *  - pinning a dictionary encoding is rejected outright
  *    (`properties.rs:426-431`): dictionary use is controlled by
  *    `dictionaryEnabled`, never by the encoding pin.
  *
  * Deliberate divergences (documented, Spark-first):
  *  - a per-column property naming a path that does not exist in the
  *    writer's schema THROWS at writer construction instead of being
  *    silently ignored — the reference's `HashMap` lookup semantics make a
  *    typo'd `enc.col1=delta` a silent no-op, which at 100 TB means a
  *    whole run encoded with the wrong layout before anyone notices;
  *  - a DEFAULT encoding pin applies only to columns whose physical type
  *    can take it (a frame mixes types; the reference instead panics at
  *    encode time). Per-COLUMN pins on an incompatible type still throw.
  */
final case class ColumnProps(
    /** pinned fallback (non-dict) value encoding — a [[PqEncoding]] id */
    encoding: Option[Int] = None,
    /** per-column block codec — a [[PqCodec]] id */
    codec: Option[Int] = None,
    dictionaryEnabled: Option[Boolean] = None,
    statisticsEnabled: Option[Boolean] = None) {
  encoding.foreach { e =>
    require(e != PqEncoding.PlainDictionary && e != PqEncoding.RleDictionary,
      "Dictionary encoding can not be used as fallback encoding " +
        "(reference properties.rs:426-431); use dictionaryEnabled instead")
  }
}

/** One column's fully-resolved write configuration (see
  * [[WriterProps.resolveFor]]). */
final case class ResolvedColProps(encPin: Option[Int], codec: Int,
    dictionary: Boolean, statistics: Boolean)

final case class WriterProps(
    default: ColumnProps = ColumnProps(),
    columns: Map[String, ColumnProps] = Map.empty) {

  def isEmpty: Boolean = default == ColumnProps() && columns.isEmpty

  private def updated(path: String)(f: ColumnProps => ColumnProps): WriterProps =
    copy(columns = columns.updated(path,
      f(columns.getOrElse(path, ColumnProps()))))

  // ---- builder-style setters (properties.rs:303-389) ----
  def withEncoding(enc: Int): WriterProps =
    copy(default = default.copy(encoding = Some(enc)))
  def withDictionaryEnabled(on: Boolean): WriterProps =
    copy(default = default.copy(dictionaryEnabled = Some(on)))
  def withCodec(codec: Int): WriterProps =
    copy(default = default.copy(codec = Some(codec)))
  def withStatisticsEnabled(on: Boolean): WriterProps =
    copy(default = default.copy(statisticsEnabled = Some(on)))
  def withColumnEncoding(path: String, enc: Int): WriterProps =
    updated(path)(_.copy(encoding = Some(enc)))
  def withColumnDictionaryEnabled(path: String, on: Boolean): WriterProps =
    updated(path)(_.copy(dictionaryEnabled = Some(on)))
  def withColumnCodec(path: String, codec: Int): WriterProps =
    updated(path)(_.copy(codec = Some(codec)))
  def withColumnStatisticsEnabled(path: String, on: Boolean): WriterProps =
    updated(path)(_.copy(statisticsEnabled = Some(on)))

  /** Resolve against a concrete writer schema: one [[ResolvedColProps]]
    * per leaf path, with per-column > default > writer-arg precedence,
    * case-insensitive path canonicalization (DSv2 option keys arrive
    * lowercased), unknown-path and incompatible-pin validation.
    *
    * `int96Timestamps` mirrors the writer flag: INT96 chunks are raw
    * fixed-width concat, so an explicit non-PLAIN pin on a timestamp leaf
    * is rejected HERE rather than silently dropped at chunk-write time
    * (the silent-no-op misconfiguration class this surface exists to
    * fail loud on). A *default* encoding still degrades silently, as for
    * every other type it cannot take. */
  def resolveFor(schema: StructType, fileCodec: Int,
      int96Timestamps: Boolean = false): Map[String, ResolvedColProps] = {
    val leaves = WriterProps.leafPathsOf(schema)
    val byExact = leaves.map(_._1).toSet
    val byLower = leaves.groupBy(_._1.toLowerCase)
    // canonicalize configured paths onto schema leaf paths
    val canon: Map[String, ColumnProps] = columns.map { case (p, cp) =>
      val key =
        if (byExact.contains(p)) p
        else byLower.get(p.toLowerCase) match {
          case Some(Seq((leaf, _))) => leaf
          case Some(many) => throw new IllegalArgumentException(
            s"writer property path '$p' is ambiguous between " +
              many.map(_._1).mkString(", "))
          case None => throw new IllegalArgumentException(
            s"writer property path '$p' does not name a leaf column of " +
              s"the schema (leaves: ${leaves.map(_._1).mkString(", ")})")
        }
      key -> cp
    }
    leaves.map { case (path, dt) =>
      val cp = canon.getOrElse(path, ColumnProps())
      val allowed =
        if (int96Timestamps &&
            (dt == TimestampType || dt == TimestampNTZType))
          Set(PqEncoding.Plain)
        else WriterProps.pinnableEncodings(dt)
      cp.encoding.foreach { e =>
        require(allowed.contains(e),
          s"encoding ${PqEncoding.name(e)} cannot encode column '$path' " +
            s"of type ${dt.simpleString} (allowed: " +
            s"${allowed.map(PqEncoding.name).mkString(", ")})")
      }
      // a default pin applies only where the physical type can take it
      val pin = cp.encoding
        .orElse(default.encoding.filter(allowed.contains))
      path -> ResolvedColProps(
        encPin = pin,
        codec = cp.codec.orElse(default.codec).getOrElse(fileCodec),
        dictionary = cp.dictionaryEnabled.orElse(default.dictionaryEnabled)
          .getOrElse(true),
        statistics = cp.statisticsEnabled.orElse(default.statisticsEnabled)
          .getOrElse(true))
    }.toMap
  }
}

object WriterProps {

  val empty: WriterProps = WriterProps()

  /** Leaf column paths + element types in writer layout: flat `name`,
    * LIST `name.list.element`, MAP `name.key_value.{key,value}`,
    * STRUCT `name.<field>` — exactly the `pathInSchema` the footer pins. */
  private[sources] def leafPathsOf(schema: StructType): Seq[(String, DataType)] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case ArrayType(et, _) => Seq((s"${f.name}.list.element", et))
        case MapType(kt, vt, _) =>
          Seq((s"${f.name}.key_value.key", kt),
            (s"${f.name}.key_value.value", vt))
        case st: StructType =>
          st.fields.toSeq.map(sf => (s"${f.name}.${sf.name}", sf.dataType))
        case dt => Seq((f.name, dt))
      }
    }

  /** Encodings this writer can PIN for a leaf of the given type. FLBA
    * decimals (p > 18) and INT96 legacy timestamps are raw fixed-width
    * concat only — nothing pinnable beyond PLAIN's raw layout. */
  private[sources] def pinnableEncodings(dt: DataType): Set[Int] = dt match {
    case BooleanType => Set(PqEncoding.Plain, PqEncoding.Rle)
    case IntegerType | DateType | LongType | TimestampType |
         TimestampNTZType =>
      Set(PqEncoding.Plain, PqEncoding.DeltaBinaryPacked)
    case d: DecimalType if d.precision <= 18 =>
      Set(PqEncoding.Plain, PqEncoding.DeltaBinaryPacked)
    case _: DecimalType => Set(PqEncoding.Plain)
    case FloatType | DoubleType =>
      Set(PqEncoding.Plain, PqEncoding.ByteStreamSplit)
    case StringType | BinaryType =>
      Set(PqEncoding.Plain, PqEncoding.DeltaLengthByteArray,
        PqEncoding.DeltaByteArray)
    case _ => Set(PqEncoding.Plain)
  }

  /** Writer-option encoding names (DSv2 `enc.<col>=` values and the
    * builder convenience): plain | rle | delta | deltalen | deltabyte |
    * bss. Dictionary names are rejected (properties.rs:426-431). */
  def parseEncoding(s: String): Int = s.toLowerCase match {
    case "plain" => PqEncoding.Plain
    case "rle" => PqEncoding.Rle
    case "delta" | "delta_binary_packed" => PqEncoding.DeltaBinaryPacked
    case "deltalen" | "delta_length_byte_array" =>
      PqEncoding.DeltaLengthByteArray
    case "deltabyte" | "delta_byte_array" => PqEncoding.DeltaByteArray
    case "bss" | "byte_stream_split" => PqEncoding.ByteStreamSplit
    case "dict" | "plain_dictionary" | "rle_dictionary" =>
      throw new IllegalArgumentException(
        "Dictionary encoding can not be used as fallback encoding " +
          "(reference properties.rs:426-431); use dict.<col>=true/false")
    case other => throw new IllegalArgumentException(s"encoding $other")
  }

  /** Build per-column overrides from string options — the DSv2/sink
    * surface: `enc.<path>=delta`, `codec.<path>=gzip`,
    * `dict.<path>=false`, `stats.<path>=false`. Keys whose prefix is not
    * one of those four kinds are ignored here (they belong to other
    * writer options); a recognized kind with a bad VALUE or an unknown
    * column path fails in `parseEncoding`/[[WriterProps.resolveFor]].
    * Paths keep the case the caller used; [[WriterProps.resolveFor]]
    * canonicalizes case-insensitively. */
  def fromOptions(opts: Iterable[(String, String)]): WriterProps = {
    opts.foldLeft(empty) { case (acc, (k, v)) =>
      val dot = k.indexOf('.')
      if (dot <= 0) acc
      else {
        val (kind, path) = (k.substring(0, dot).toLowerCase,
          k.substring(dot + 1))
        kind match {
          case "enc" => acc.withColumnEncoding(path, parseEncoding(v))
          case "codec" => acc.withColumnCodec(path, PqCodec.parse(v))
          case "dict" =>
            acc.withColumnDictionaryEnabled(path, v.toBoolean)
          case "stats" =>
            acc.withColumnStatisticsEnabled(path, v.toBoolean)
          case _ => acc
        }
      }
    }
  }
}
