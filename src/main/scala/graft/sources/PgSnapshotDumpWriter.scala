package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Writer side of the pgsnapshot COPY text dump (the reference's native
  * interchange format: `osmosis --write-pgsql-dump` produces these
  * files and `COPY ... FROM` loads them — osm-pg-etl.md:80-113). The
  * encoder is pure Catalyst column expressions over the entity schema,
  * so the dump write is a distributed narrow map + text sink: one dump
  * file per partition, no driver involvement — the scale mirror of the
  * blob-granular readers.
  *
  * Encodings (exact inverses of [[PgSnapshotDump]]'s parsers):
  *   - COPY cell escapes `\\ \t \n \r`, NULL as `\N`
  *   - tags as hstore literal `"k"=>"v", ...` with `\` and `"` escaped
  *     at the hstore layer (COPY escaping then doubles backslashes at
  *     the cell layer — the reader decodes the two layers in reverse)
  *   - nodes as `{1,2,3}`, geometry as WKT `POINT(lon lat)` /
  *     `LINESTRING(lon lat, ...)`
  *   - timestamps as `yyyy-MM-dd HH:mm:ss.SSSSSS` (UTC), which the
  *     reader's ANSI timestamp parse accepts losslessly
  */
object PgSnapshotDumpWriter {

  /** COPY text-format cell escaping; backslash first, then the three
    * characters that are structural in the line format. */
  private def copyEscape(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\t" -> "\\t", "\n" -> "\\n", "\r" -> "\\r")
    esc.foldLeft(c) { case (acc, (from, to)) =>
      call_function("replace", acc, lit(from), lit(to))
    }
  }

  /** hstore-literal escaping for keys/values: `\` and `"`. */
  private def hstoreEscape(c: Column): Column =
    call_function("replace",
      call_function("replace", c, lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\""))

  private def pointWkt(c: Column): Column =
    concat(lit("POINT("), c.getField("lon").cast("string"), lit(" "),
      c.getField("lat").cast("string"), lit(")"))

  private def cellFor(name: String, dt: DataType): Column = {
    val c = col(name)
    dt match {
      case LongType | IntegerType => c.cast("string")
      case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      case MapType(StringType, StringType, _) =>
        array_join(
          transform(map_entries(c), e =>
            concat(lit("\""), hstoreEscape(e.getField("key")),
              lit("\"=>\""), hstoreEscape(e.getField("value")), lit("\""))),
          ", ")
      case ArrayType(LongType, _) =>
        concat(lit("{"),
          array_join(transform(c, _.cast("string")), ","), lit("}"))
      case t if t == PgSnapshotDump.pointType =>
        pointWkt(c)
      case ArrayType(e, _) if e == PgSnapshotDump.pointType =>
        concat(lit("LINESTRING("),
          array_join(transform(c, p =>
            concat(p.getField("lon").cast("string"), lit(" "),
              p.getField("lat").cast("string"))), ","),
          lit(")"))
      case StringType => c
      case other =>
        throw new IllegalArgumentException(s"unhandled dump type $other")
    }
  }

  /** One escaped COPY line per row, column `value` — feed to
    * `.write.text(path)` (or any text sink). */
  def encode(df: DataFrame, entity: String): DataFrame = {
    val schema = PgSnapshotDump.schemaFor(entity)
    val cells = schema.fields.map { f =>
      coalesce(copyEscape(cellFor(f.name, f.dataType)), lit("\\N"))
    }
    df.select(concat_ws("\t", cells.toIndexedSeq: _*).as("value"))
  }

  /** Write `df` as a pgsnapshot COPY dump directory readable by
    * [[PgDumpSource]] and by PostgreSQL `COPY ... FROM`. */
  def write(df: DataFrame, entity: String, path: String): Unit =
    encode(df, entity).write.mode("overwrite").text(path)
}
