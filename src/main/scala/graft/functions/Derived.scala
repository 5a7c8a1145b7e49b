package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column expression library re-expressing the reference's scalar
  * helpers as pure Catalyst expression compositions (no UDFs — everything
  * here stays inside whole-stage codegen).
  *
  * Reference provenance (see SURVEY.md §2.2):
  *  - niteOf:          /root/reference/bin/monitor_DBB_stagein.py:707-715
  *  - bandOf:          /root/reference/bin/monitor_DBB_stagein.py:752-758
  *  - fieldOf:         /root/reference/bin/monitor_DBB_stagein.py:776-779
  *  - isSne:           /root/reference/bin/monitor_DBB_stagein.py:765-768
  *  - manifestNameOf:  /root/reference/bin/monitor_DBB_stagein.py:769-774
  *  - expnumOf:        /root/reference/bin/monitor_DBB_stagein.py:844-846
  *  - decamNameOf:     /root/reference/bin/monitor_DBB_stagein.py:341
  *  - filetypeOf:      /root/reference/bin/save_DBB_stagein_to_DBB.py:36-45
  *  - uniqName:        /root/reference/bin/save_DBB_stagein_to_DBB.py:253-256
  *  - yearMonthOf:     /root/reference/bin/save_DBB_stagein_to_DBB.py:244-245
  *  - payloadNameOf:   /root/reference/bin/save_DBB_stagein_to_DBB.py:318
  *  - basenameOf:      /root/reference/bin/save_DBB_stagein_to_DBB.py:140
  */
object Derived {

  /** Observation "nite": the 15:00 local-time-cutoff calendar day, as a
    * `yyyyMMdd` string. Timestamps before 15:00 belong to the previous nite.
    * The cutoff hour is a parameter (reference hardcodes 15).
    */
  def niteOf(ts: Column, cutoffHour: Int = 15): Column =
    date_format(
      when(hour(ts) < cutoffHour, ts - expr("INTERVAL 1 DAY")).otherwise(ts),
      "yyyyMMdd")

  /** First whitespace-separated token of a filter string; null-safe (the
    * reference swallows exceptions and stores None). */
  def bandOf(filter: Column): Column =
    when(filter.isNotNull && trim(filter) =!= "",
      substring_index(trim(filter), " ", 1))

  /** Field name extracted from an SNe `object` string (e.g. "... hex C3 ..."
    * → "C3"); null when the pattern is absent. */
  def fieldOf(obj: Column): Column = {
    val m = regexp_extract(obj, "hex\\s+(\\S+)", 1)
    when(m =!= "", m)
  }

  /** SNe detector: obstype 'object' rows whose object mentions a supernova
    * field. */
  def isSne(obstype: Column, obj: Column): Column =
    obstype === "object" && obj.contains("DES supernova")

  /** Manifest filename derived from a seqid: strip `[ :-]`, prefix/suffix. */
  def manifestNameOf(seqid: Column): Column =
    concat(lit("manifest_"), regexp_replace(seqid, "[ :-]", ""), lit(".json"))

  /** Exposure number parsed out of a DECam filename, as a long (null on
    * non-matching names). */
  def expnumOf(filename: Column): Column = {
    val m = regexp_extract(filename, "DECam_(\\d+)\\.fits\\.fz", 1)
    when(m =!= "", m.cast("long"))
  }

  /** Inverse of expnumOf: canonical zero-padded DECam filename. */
  def decamNameOf(expnum: Column): Column =
    format_string("DECam_%08d.fits.fz", expnum)

  /** Filetype classifier: `.fits` → raw, `manifest_SN*.json` → snmanifest,
    * else null (reference returns None → quarantine). */
  def filetypeOf(name: Column): Column =
    when(name.endsWith(".fits") || name.endsWith(".fits.fz"), "raw")
      .when(name.startsWith("manifest_SN") && name.endsWith(".json"),
        "snmanifest")

  /** Unique quarantine name: `<name>.<yyyyMMddHHmmssSSS>` (ms precision). */
  def uniqName(name: Column, ts: Column): Column =
    concat(name, lit("."), date_format(ts, "yyyyMMddHHmmssSSS"))

  /** `yyyy/MM` partition path fragment for the quarantine area. */
  def yearMonthOf(ts: Column): Column = date_format(ts, "yyyy/MM")

  /** Payload path derived from a notify path by stripping the `.dbb`
    * suffix. */
  def payloadNameOf(notifyPath: Column): Column =
    regexp_replace(notifyPath, "\\.dbb$", "")

  /** Basename (last path component). */
  def basenameOf(path: Column): Column =
    element_at(split(path, "/"), -1)

  /** Generic `${var}` template interpolation over a metadata map — the
    * reference's `replfuncs.replace_vars_single(dirpat, metadata)`
    * (save_DBB_stagein_to_DBB.py:184) with patterns sourced from the
    * OPS_DIRECTORY_PATTERN dim table (save:342-343). Expression-only:
    * a fold over map_entries that rewrites each `${key}` occurrence, so
    * a layout change is a dim-table edit, not a recompile. Unknown
    * `${...}` tokens are left intact (same as the reference). Entries
    * apply in map order; values must not themselves contain `${`. */
  def interpolate(pattern: Column, meta: Column): Column =
    aggregate(map_entries(meta), pattern,
      (acc, e) => org.apache.spark.sql.functions.replace(acc,
        concat(lit("$" + "{"), e.getField("key"), lit("}")),
        e.getField("value")))
}
