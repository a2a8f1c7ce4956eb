package org.apache.spark.sql.graftshim

import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

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

  /** (array<double>, array<double>) — the float cosine signature. */
  val arrayDoublePair: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
}
