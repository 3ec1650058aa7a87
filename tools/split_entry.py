#!/usr/bin/env python3
"""One-shot refactor: split the 33k-line SparkEntry.scala monolith into
per-domain part files behind the same `queries`/`oracleSql` maps.

Produces:
  src/main/scala/graft/entry/EntryShared.scala   (helpers, case class, SQL CTEs)
  src/main/scala/graft/entry/Queries*.scala      (8 domain part objects)
  src/main/scala/graft/SparkEntry.scala          (thin facade, same public API)

No behavior change: same 600 keys, same lambdas, same oracle strings.
"""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"

# (object name, lo, hi, file doc)
PARTS = [
    ("QueriesCore", 1, 75,
     "Core relational surface, IO/catalog round trips, and the first LLM-"
     "pipeline operators (dedup, ANN, streaming, multimodal): q01-q75."),
    ("QueriesPipeline", 76, 150,
     "LLM training-data pipeline depth: semantic/line dedup, BM25/BPE, "
     "sketches, sampling, SCD/CDC, graph ranking, selection: q76-q150."),
    ("QueriesAnalytics1", 151, 225,
     "Analytics breadth I — engagement, ranking metrics, hypothesis "
     "tests, ER blocking, time-series: q151-q225."),
    ("QueriesAnalytics2", 226, 300,
     "Analytics breadth II — experimentation, concentration/inequality, "
     "nonparametric tests, attribution: q226-q300."),
    ("QueriesStats1", 301, 375,
     "Statistics gallery I — causal inference, survival, SPC, "
     "change-point and trend tests: q301-q375."),
    ("QueriesStats2", 376, 450,
     "Statistics gallery II — NLP eval metrics, discovery, forecasting, "
     "robust estimation, ops research: q376-q450."),
    ("QueriesStats3", 451, 525,
     "Statistics gallery III — queueing, spatial stats, clustering "
     "diagnostics, finance/risk: q451-q525."),
    ("QueriesStats4", 526, 600,
     "Statistics gallery IV — dispersion/fit diagnostics, KPI rollups, "
     "calendar envelopes: q526-q600."),
]

lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found from line {start}")

obj_start = find(lambda l: l == "object SparkEntry {")
entry_doc = find(lambda l: "/** Flagship query" in l, obj_start)
qmap_start = find(lambda l: l.startswith("  def queries: Map["), obj_start)
qmap_end = find(lambda l: l == "  )", qmap_start)
omap_start = find(lambda l: l.startswith("  def oracleSql: Map["), qmap_end)
omap_end = find(lambda l: l == "  )", omap_start)
assert lines[omap_end + 1] == "}", lines[omap_end + 1]

header_imports = lines[:obj_start]          # package + imports + file doc
helpers_head = lines[obj_start + 1:entry_doc]   # case class + t/scratchDir/...
helpers_mid = lines[qmap_end + 1:omap_start]    # SQL CTE vals/defs

ENTRY_RE = re.compile(r'^    "(q\d+)_[a-z0-9_]+" ->')

def parse_entries(lo, hi):
    """Split map-body lines into {qnum: chunk_lines}."""
    body = lines[lo:hi]
    entries = {}
    cur_num, cur = None, []
    for l in body:
        m = ENTRY_RE.match(l)
        if m:
            if cur_num is not None:
                entries.setdefault(cur_num, []).extend(cur)
            cur_num, cur = int(m.group(1)[1:]), [l]
        else:
            cur.append(l)
    if cur_num is not None:
        entries.setdefault(cur_num, []).extend(cur)
    return entries

q_entries = parse_entries(qmap_start + 1, qmap_end)
o_entries = parse_entries(omap_start + 1, omap_end)
assert len(q_entries) == 600, len(q_entries)
assert len(o_entries) == 600, len(o_entries)
assert set(q_entries) == set(o_entries)

def strip_trailing_blank_and_comma(chunk):
    """Normalize an entry chunk: drop trailing blank lines, ensure the
    last code line ends with a comma (map-entry separator)."""
    while chunk and chunk[-1].strip() == "":
        chunk = chunk[:-1]
    if not chunk[-1].rstrip().endswith(","):
        chunk[-1] = chunk[-1].rstrip() + ","
    return chunk

def drop_last_comma(out):
    """Strip the trailing comma from the last code line so we never rely
    on trailing-comma-before-blank-line parsing."""
    for i in range(len(out) - 1, -1, -1):
        if out[i].strip():
            out[i] = out[i].rstrip().rstrip(",")
            return

def departial(block):
    """private members become plain members of the private[graft] object."""
    return [re.sub(r"^(\s*)private (def|val|final)", r"\1\2", l) for l in block]

imports_text = "\n".join(header_imports[header_imports.index("package graft"):])
# keep only package + import lines (drop any file-level doc comment)
imp_lines = [l for l in header_imports if l.startswith(("package ", "import "))]
imports_text = imp_lines[0] + "\n\n" + "\n".join(imp_lines[1:])

shared = []
shared.append(imports_text)
shared.append("")
shared.append("/** Shared fixtures for the [[SparkEntry]] query parts: table")
shared.append("  * readers, deterministic scratch dirs, the near-dup corpus,")
shared.append("  * and the SQL fragments used verbatim by both engines.")
shared.append("  */")
shared.append("private[graft] object EntryShared {")
shared.extend(departial(helpers_head))
shared.extend(departial(helpers_mid))
shared.append("}")
open("src/main/scala/graft/entry/EntryShared.scala", "w").write(
    "\n".join(shared).rstrip() + "\n")

part_of = {}
for name, lo, hi, _ in PARTS:
    for n in range(lo, hi + 1):
        part_of[n] = name

for name, lo, hi, doc in PARTS:
    nums = sorted(n for n in q_entries if lo <= n <= hi)
    out = []
    out.append(imports_text)
    out.append("import graft.EntryShared._")
    out.append("")
    out.append(f"/** {doc}")
    out.append("  * Part of the [[SparkEntry]] surface; see EntryShared for")
    out.append("  * the helpers these entries call.")
    out.append("  */")
    out.append(f"private[graft] object {name} {{")
    out.append("")
    out.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
    for n in nums:
        out.extend(strip_trailing_blank_and_comma(list(q_entries[n])))
        out.append("")
    drop_last_comma(out)
    out.append("  )")
    out.append("")
    out.append("  val oracles: Map[String, String] = Map(")
    for n in nums:
        out.extend(strip_trailing_blank_and_comma(list(o_entries[n])))
        out.append("")
    drop_last_comma(out)
    out.append("  )")
    out.append("}")
    open(f"src/main/scala/graft/entry/{name}.scala", "w").write(
        "\n".join(out).rstrip() + "\n")

part_names = [p[0] for p in PARTS]
facade = f"""package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}

/** The driver's contract: a flagship `entry` query, one `queries` entry per
  * implemented operator/query, and per-key DuckDB `oracleSql` for the
  * correctness gate. The 600 entries live in per-domain part files under
  * `graft.entry` (split from a single 33k-line monolith in round 4 — same
  * keys, same lambdas, same oracle strings); each part carries matched
  * `queries`/`oracles` maps and this facade is their concatenation.
  */
object SparkEntry {{

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private val parts = Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])](
{chr(10).join(f"    ({p}.queries, {p}.oracles)," for p in part_names)}
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    parts.iterator.map(_._1).reduce(_ ++ _)

  val oracleSql: Map[String, String] =
    parts.iterator.map(_._2).reduce(_ ++ _)
}}
"""
open(SRC, "w").write(facade)
print("parts written; entries:", len(q_entries))
