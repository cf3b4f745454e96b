package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join by prefix filtering (Chaudhuri–
  * Ganti–Kaushik ICDE'06; Xiao et al.'s PPJoin family) — the lossless
  * counterpart of [[Dedup]]'s MinHash LSH: LSH trades recall for
  * candidate sparsity, prefix filtering keeps EVERY qualifying pair by
  * a theorem, not a probability. The standard tool when the dedup
  * manifest must be exhaustive (legal holds, benchmark decontamination
  * audits) rather than statistically near-complete.
  *
  * Theorem (prefix filter): order the token universe totally; if
  * J(A, B) ≥ t then the first `|A| − ⌈t·|A|⌉ + 1` tokens of A and the
  * corresponding prefix of B share at least one token. The order is
  * chosen RAREST-FIRST (ascending document frequency, token text as
  * tiebreak) so prefixes are the least common tokens and the candidate
  * join fans out minimally — the frequency order is what makes the
  * filter effective, correctness holds under any total order.
  *
  * Scale shape: token sets and df are two map-side-combinable
  * aggregates; the per-document prefix is a PARTITION-BY-doc window
  * (never global — the (df, token) tuple is the sort key directly, no
  * materialized global rank); candidates come from ONE equi-join of
  * prefix rows on the token, so only rare-token co-occurrence pays;
  * verification joins candidate pairs back to full sets and folds the
  * intersection with one aggregate. The Jaccard gate compares
  * cross-multiplied integers (`1000000·∩ ≥ t_micro·∪`) — no division,
  * no floats, exact at every magnitude. */
object SetSim {

  /** All unordered document pairs with item-set Jaccard ≥ `tMicro/1e6`,
    * as `(doc_a, doc_b, inter, union_sz, jacc_micro)` — `jacc_micro`
    * exact integer micros. `items` is the `(doc_id, item)` element
    * relation (e.g. [[Decontam.gramFingerprints]]' shingle prints);
    * set semantics are enforced here with one distinct. */
  def join(spark: SparkSession, items: DataFrame, tMicro: Long): DataFrame = {
    require(tMicro > 0 && tMicro <= 1000000L,
      s"threshold micros must be in (0, 1e6], got $tMicro")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toks = items.select(col("doc_id"), col("item").as("tok")).distinct()
      .persist(lvl)
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    // prefix length |A| - ceil(t*|A|) + 1, with ceil(t*len) in pure
    // integer arithmetic: ceil(a/b) = (a + b - 1) div b
    val prefLen =
      expr(s"len - (len * ${tMicro}L + 999999L) DIV 1000000L + 1L")
    val byRarity = Window.partitionBy("doc_id")
      .orderBy(col("df").asc, col("tok").asc)
    val prefix = toks.join(df, "tok").join(lens, "doc_id")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefLen)
      .select("doc_id", "tok")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Verification by per-doc sorted token ARRAYS instead of the double
    // token equi-join: the join route shuffles |cand|·|set| element rows
    // twice and re-aggregates them (measured 5.8 s at sf0.1, vs 1.7 s
    // for two document-keyed array joins + one codegen'd
    // `array_intersect` per candidate pair, OPTIMIZATION_r06). Arrays
    // are per-document — buffers bounded by a single document's
    // distinct-token count, never corpus-sized — and already deduped,
    // so |array_intersect| IS |A∩B|; lengths ride as size(array),
    // deleting the two lens joins too. The union/Jaccard arithmetic is
    // unchanged exact-integer micros.
    val arrs = toks.groupBy("doc_id")
      .agg(sort_array(collect_list(col("tok"))).as("ts"))
      .persist(lvl)
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("ts").as("ta")),
        "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("ts").as("tb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        size(col("ta")).cast("long").as("len_a"),
        size(col("tb")).cast("long").as("len_b"))
      .withColumn("union_sz", col("len_a") + col("len_b") - col("inter"))
      .filter(col("inter") * 1000000L >= col("union_sz") * tMicro)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_sz"),
        expr("inter * 1000000L DIV union_sz").as("jacc_micro"))
  }
}
