package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.types._

import graft.ops.Ann

/** Typed table/schema system — the Spark twin of the reference's
  * msgspec-reflected `Table(Storage)` classes
  * (/root/reference/vechord/spec.py:519-560): one case class = one table,
  * schema derived from the class via its `Encoder`, with primary-key /
  * foreign-key / index declarations carried as metadata (spec.py:135-180,
  * 417-491).
  *
  * UNSET vs NULL (spec.py:621-648, SURVEY §7.3): a "partial row" here is a
  * DataFrame projection — an unselected field simply has no column
  * (UNSET), while a selected-but-null field is a SQL NULL. The projection
  * mask replaces the reference's per-field UNSET sentinel.
  */
object Spec {

  /** Primary-key generation strategy (spec.py:183-255). */
  sealed trait IdGen
  object IdGen {
    /** Caller supplies the key. */
    case object Manual extends IdGen
    /** BIGINT identity twin: max(existing)+1.. assigned at insert. */
    case object AutoIncrement extends IdGen
    /** Time-sortable UUIDv7, client-generated (spec.py:213-255). */
    case object UuidV7 extends IdGen
  }

  /** `Annotated[int, ForeignKey[Other.col]]` twin (spec.py:135-180);
    * deletes always cascade (spec.py:170-173's ON DELETE CASCADE). */
  final case class ForeignKey(column: String, refTable: String,
                              refColumn: String)

  /** Index declarations (spec.py:417-491). */
  sealed trait IndexDef { def column: String }
  /** vchordrq twin: IVF with `lists` cells under `distance`
    * (spec.py:437-444). `quantized` scans 8-bit SQ codes within probed
    * cells; `oneBit` scans 1-bit RaBitQ-style residual-sign codes (the
    * vchordrq default quantization); `pq` > 0 scans positional
    * product-quantization codes over that many subspaces — all three
    * exact-re-rank survivors, and at most ONE may be chosen (two
    * quantizations of one column is a contradiction, refused here
    * rather than silently resolved by branch order). */
  final case class VectorIndex(column: String, distance: Ann.Metric = Ann.L2,
                               lists: Int = 0,
                               quantized: Boolean = false,
                               oneBit: Boolean = false,
                               pq: Int = 0,
                               mrlDims: Int = 0) extends IndexDef {
    require(Seq(quantized, oneBit, pq > 0).count(identity) <= 1,
      s"vector index on '$column' declares more than one quantization " +
        s"(quantized=$quantized, oneBit=$oneBit, pq=$pq)")
    // matryoshka is the TRUNCATION axis: a two-phase index whose
    // phase 1 ranks the leading `mrlDims` coordinates — flat when
    // lists == 0, COMPOSED with IVF cell pruning when lists > 0 (the
    // r78 shape: cells prune first, the prefix cut runs within probed
    // cells). A VALUE quantization under a truncated phase 1 stays
    // refused: two compressions of one scan would stack their recall
    // losses with no contract for the product.
    require(mrlDims >= 0,
      s"vector index on '$column': mrlDims must be >= 0 (got $mrlDims)")
    require(mrlDims == 0 || (!quantized && !oneBit && pq == 0),
      s"vector index on '$column' combines mrlDims=$mrlDims with a " +
        "value quantization — one compression axis per scan")
    // L2 native; cosine via the normalize-then-L2 reduction (real
    // truncatable embedding models are cosine-normalized — the
    // reference's Gemini/OpenAI/Voyage truncatable-dims providers,
    // embedding.py:114-160,267-308). Inner product refused: unbounded
    // norms admit no sphere reduction, so a prefix cut has no
    // neighborhood contract to honor.
    require(mrlDims == 0 || distance != Ann.InnerProduct,
      s"vector index on '$column': matryoshka supports L2 and cosine " +
        "(normalize-then-L2) — inner product has no prefix-cut " +
        "neighborhood contract")
  }
  /** Multi-vector maxsim index (spec.py:447-464). */
  final case class MultiVectorIndex(column: String, lists: Int = 0)
    extends IndexDef
  /** BM25 keyword index with a tokenizer model (spec.py:468-479). */
  final case class KeywordIndex(column: String,
                                model: String = "simple") extends IndexDef
  /** Sparse-vector index over an (indices, values) column pair — the
    * engine surface for the reference's SPLADE sparse embeddings
    * (embedding.py:413-441, model struct `SparseEmbedding`; the
    * reference stores them and delegates scoring to SQL — here the
    * index FORM is the inverted-postings relation,
    * [[graft.functions.Sparse.invertedPostings]]). `column` holds the
    * sorted bucket indices (array&lt;int&gt;), `valuesColumn` the
    * aligned weights. */
  final case class SparseIndex(column: String, valuesColumn: String)
    extends IndexDef

  /** Unique constraint (spec.py:482-491) — validated, not enforced, in a
    * batch engine; see Registry.validateUnique. */
  final case class UniqueIndex(column: String,
                               nullNotDistinct: Boolean = false)
    extends IndexDef

  /** One table: case class `T` + declarations. `vectorDims` pins the
    * `Vector[dim]` dimension per column for validation (spec.py:59-132). */
  final case class TableDef[T <: Product](
      name: String,
      primaryKey: Option[String] = None,
      idGen: IdGen = IdGen.Manual,
      foreignKeys: Seq[ForeignKey] = Nil,
      indexes: Seq[IndexDef] = Nil,
      vectorDims: Map[String, Int] = Map.empty)(implicit val enc: Encoder[T]) {

    def schema: StructType = enc.schema
    def columns: Seq[String] = schema.fieldNames.toSeq

    require(primaryKey.forall(columns.contains),
      s"primary key not in schema for table $name")
    require(foreignKeys.forall(fk => columns.contains(fk.column)),
      s"foreign key column not in schema for table $name")
    require(indexes.forall(ix => columns.contains(ix.column)),
      s"index column not in schema for table $name")
    require(indexes.collect { case s: SparseIndex => s.valuesColumn }
        .forall(columns.contains),
      s"sparse values column not in schema for table $name")

    def pk: String = primaryKey.getOrElse(
      throw new IllegalStateException(s"table $name has no primary key"))

    private def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    private def isMultiVec(dt: DataType): Boolean = dt match {
      case ArrayType(inner, _) => isFloatArray(inner)
      case _ => false
    }

    /** Columns holding dense vectors (array<float|double>). */
    def vectorColumns: Seq[String] =
      schema.fields.filter(f => isFloatArray(f.dataType)).map(_.name).toSeq
    /** Columns holding multi-vectors (array<array<float|double>>). */
    def multiVectorColumns: Seq[String] =
      schema.fields.filter(f => isMultiVec(f.dataType)).map(_.name).toSeq
    /** Keyword (BM25-indexed text) columns. */
    def keywordColumns: Seq[String] =
      indexes.collect { case KeywordIndex(c, _) => c }

    /** Default search projection: everything except vector / multivec /
      * keyword / sparse payloads (spec.py:585-596's
      * `non_vec_columns`). The sparse VALUES column is a float array
      * (already excluded); the indices column is excluded by its index
      * declaration. */
    def nonVecColumns: Seq[String] = {
      val excluded = (vectorColumns ++ multiVectorColumns ++
        keywordColumns ++
        indexes.collect { case s: SparseIndex => s.column }).toSet
      columns.filterNot(excluded)
    }

    def vectorIndex: Option[VectorIndex] =
      indexes.collectFirst { case v: VectorIndex => v }
    def keywordIndex: Option[KeywordIndex] =
      indexes.collectFirst { case k: KeywordIndex => k }
  }

  /** `= ANY(list)` filter value (spec.py:513-516). */
  final case class AnyOf(values: Seq[Any])
  /** Explicit IS NULL filter value. */
  case object IsNull
}
