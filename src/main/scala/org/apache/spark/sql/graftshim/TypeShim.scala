package org.apache.spark.sql.graftshim

import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, TypeCollection}

/** `AbstractDataType` is `private[sql]`, so an `ImplicitCastInputTypes`
  * expression outside the Spark namespace cannot write its `inputTypes`
  * signature directly. These pre-built Seqs let graft's kernels override
  * the member with an INFERRED type (the standard extension-library shim
  * pattern, same rationale as [[ColumnBridge]]). No behavior lives here.
  */
object TypeShim {
  /** (array<int>, array<int>) — the int8-vector kernel signature. */
  val arrayIntPair: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  /** (array<int|bigint>, array<int|bigint>) — the int8-vector kernel
    * signature with LOSSLESS bigint acceptance (r14 ADVICE): an
    * array<bigint> SQL input matches the second collection member with
    * NO cast node (the kernel reads longs directly), so values outside
    * Int32 can never silently wrap through a narrowing cast; array<int>
    * still matches the first member cast-free, leaving every committed
    * engine plan byte-identical. Narrower integrals (tinyint/smallint)
    * implicitly WIDEN to the first member — lossless by construction.
    */
  val arrayIntOrLongPair: Seq[AbstractDataType] = {
    val e = TypeCollection(ArrayType(IntegerType), ArrayType(LongType))
    Seq(e, e)
  }

  /** (array<double>, array<double>) — the float cosine signature. */
  val arrayDoublePair: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  /** (array<double>) — the unary quantizer signature. */
  val arrayDoubleSingle: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
}
