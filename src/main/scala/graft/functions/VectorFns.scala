package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Catalyst higher-order functions —
  * dot product / norm / cosine over `array<float|double>` columns without
  * UDFs, so similarity search stays codegen'd and scales with the scan.
  * Columns are referenced by NAME (Spark 4's Column no longer exposes its
  * expression tree).
  *
  * Scale path for ANN: brute-force top-k is a broadcast of the (small)
  * query set against the full embedding table — a single narrow pass, no
  * shuffle except the final per-query top-k. The bucketed variant (IVF /
  * LSH) prunes candidates before the distance computation.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ in double precision (inputs cast element-wise). */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, " +
      "(x, y) -> cast(x as double) * cast(y as double)), 0.0d, (acc, v) -> acc + v)")

  /** ‖a‖₂ */
  def l2Norm(a: String): Column =
    sqrt(expr(s"aggregate($a, 0.0d, " +
      "(acc, v) -> acc + cast(v as double) * cast(v as double))"))

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: String, b: String): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Random-hyperplane LSH bucket for a vector: sign bits of dot products
    * with `numPlanes` deterministic pseudo-random hyperplanes whose
    * components are derived from md5(seed:plane:dim) — reproducible
    * across engines and runs (no Math.random, per design). Returns a
    * bigint bucket id in [0, 2^numPlanes). */
  def hyperplaneBucket(vecCol: String, dim: Int, numPlanes: Int, seed: Int = 7): Column = {
    val planeBits = (0 until numPlanes).map { p =>
      // component c of plane p in [-0.5, 0.5): (hash60 % 1000)/1000 - 0.5
      val comps = (0 until dim).map { d =>
        s"((cast(conv(substr(md5('$seed:$p:$d'), 1, 15), 16, 10) as bigint) % 1000) / 1000.0d - 0.5d)"
      }
      val prod = s"aggregate(zip_with($vecCol, array(${comps.mkString(",")}), " +
        "(x, y) -> cast(x as double) * y), 0.0d, (a, v) -> a + v)"
      s"(case when ($prod) > 0 then ${1L << p}L else 0L end)"
    }
    expr(planeBits.mkString(" + "))
  }
}
