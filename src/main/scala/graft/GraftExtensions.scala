package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, L2Squared, LangTrigramScores, Md5H60, RollingFingerprint, SubwordTokens}

/** Engine extension point: registers graft's native Catalyst expressions so
  * they are callable from SQL / `expr(...)` in any session built with
  * `.withExtensions(new GraftExtensions)` (or via
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_prod"),
      // SQL-facing doc (DESCRIBE FUNCTION) states the null contract: it
      // is part of the function's surface, not just its scaladoc
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_prod",
        "_FUNC_(a, b) - Returns the dot product of two numeric arrays " +
          "(float arrays are read widened to double), accumulating left " +
          "to right. Mismatched lengths use the common prefix. Returns " +
          "NULL if either array is NULL or any element in the common " +
          "prefix is NULL.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_prod(a, b) takes two arrays")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2Squared].getName, null, "l2_sq",
        "_FUNC_(a, b) - Returns the squared Euclidean distance of two " +
          "numeric arrays (float arrays are read widened to double), " +
          "accumulating (a[i]-b[i])^2 left to right. Mismatched lengths " +
          "use the common prefix. Returns NULL if either array is NULL " +
          "or any element in the common prefix is NULL.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "l2_sq(a, b) takes two arrays")
        L2Squared(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("lang_scores"),
      new ExpressionInfo(classOf[LangTrigramScores].getName, null,
        "lang_scores",
        "_FUNC_(text) - Returns the struct<en:int,de:int,es:int,fr:int> " +
          "of char-trigram language-profile hit counts over lower(text) " +
          "(the Text.langId battery's kernel). Texts shorter than 3 " +
          "codepoints score 0 everywhere; NULL text scores (0,0,0,0) " +
          "(the kernel is non-nullable, matching the HOF contract it " +
          "retired).", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "lang_scores(text) takes one string")
        LangTrigramScores(
          org.apache.spark.sql.catalyst.expressions.Lower(children.head))
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_h60"),
      new ExpressionInfo(classOf[Md5H60].getName, null, "md5_h60",
        "_FUNC_(x) - Returns the first 15 hex digits of md5(x) as a " +
          "non-negative BIGINT in [0, 2^60) (strings hash their UTF-8 " +
          "bytes). The engine's portable seeded hash; identical in " +
          "DuckDB as CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT).",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_h60(x) takes one argument")
        Md5H60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("subword_tokens"),
      new ExpressionInfo(classOf[SubwordTokens].getName, null,
        "subword_tokens",
        "_FUNC_(text) - Returns the BPE-style pre-token array: maximal " +
          "ASCII letter runs, maximal ASCII digit runs, single other " +
          "non-whitespace glyphs (one code point each); whitespace is " +
          "Java regex \\s (ASCII only). NULL in, NULL out.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "subword_tokens(text) takes one string")
        SubwordTokens(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nearest_cos"),
      new ExpressionInfo(classOf[graft.functions.NearestVec].getName, null,
        "nearest_cos",
        "_FUNC_(v, cands) - Returns the id of the candidate in " +
          "cands: array<struct<id int|bigint, vec array<float|double>>> " +
          "with the HIGHEST cosine similarity to v (cosine_sim's exact " +
          "loop); ties break to the smallest id, a NULL candidate " +
          "vector ranks below every non-NULL. Bit-identical to " +
          "max(struct(cosine_sim(v, vec), -id)). NULL if v or cands is " +
          "NULL or cands is empty.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "nearest_cos(v, cands) takes two arguments")
        graft.functions.NearestVec(children.head, children(1), "cos")
      }))
    ext.injectFunction((
      new FunctionIdentifier("nearest_l2"),
      new ExpressionInfo(classOf[graft.functions.NearestVec].getName, null,
        "nearest_l2",
        "_FUNC_(v, cands) - Returns the id of the candidate in " +
          "cands: array<struct<id int|bigint, vec array<float|double>>> " +
          "with the SMALLEST squared L2 distance to v (l2_sq's exact " +
          "loop incl. its NULL-element contract); ties break to the " +
          "smallest id, a NULL distance ranks smallest (wins) — the " +
          "min(struct(l2_sq(v, vec), id)) struct ordering, mirrored. " +
          "NULL if v or cands is NULL or cands is empty.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "nearest_l2(v, cands) takes two arguments")
        graft.functions.NearestVec(children.head, children(1), "l2")
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_fp(text) takes one string")
        RollingFingerprint(children.head)
      }))
    // Spark ships bloom-filter machinery for its own runtime filters
    // (InjectRuntimeFilter) but does NOT register it in the public
    // FunctionRegistry — expose it so the pre-shuffle semi-join screen
    // (Relational.bloomSemiJoin) is a first-class, SQL-spellable
    // operator instead of an optimizer-internal. No custom kernel: these
    // are Spark's own expressions, same classes the runtime filter uses.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, null, "bloom_agg",
        "_FUNC_(xxhash64(key), estimatedItems) - Builds a bloom filter " +
          "(binary) over the hashed key column.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "bloom_agg(hashedKey, estimatedItems) takes two arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, null, "bloom_might_contain",
        "_FUNC_(bloom, xxhash64(key)) - True if the key MAY be in the " +
          "bloom filter (false positives possible, false negatives not).",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "bloom_might_contain(bloom, hashedKey) takes two arguments")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(children.head, children(1))
      }))
  }
}
