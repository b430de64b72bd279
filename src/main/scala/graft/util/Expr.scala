package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-building helpers. */
object Expr {

  /** Bind an expensive subexpression to a lambda variable so it is
    * evaluated ONCE per row, however many times `f` references it.
    *
    * Motivation: composing `Column`s duplicates the underlying expression
    * tree per reference, and Catalyst's CollapseProject re-inlines
    * deterministic intermediate columns — a MinHash signature referenced by
    * 16 band slices would otherwise recompute (and re-hash every shingle)
    * 16 times per row. A single-element `transform` introduces a real
    * lambda binding the optimizer keeps.
    */
  def bind(e: Column, f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)
}
