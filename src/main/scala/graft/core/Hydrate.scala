package graft.core

/** Placeholder hydration for configured SQL text — the analogue of the
  * reference's `hydrate_query` (Pype.py:170-177), which string-replaces
  * each `{key}` with its value. The reference also supports a dead
  * `offset` suffix parameter (no caller passes it); we drop it.
  *
  * Replacement targets the explicit `{key}` token form, so an un-braced
  * occurrence of a placeholder name in the SQL is never touched (the
  * reference replaces bare `str(key)` anywhere in the text, which can
  * corrupt queries whose column names collide with placeholder names).
  */
object Hydrate {
  def apply(query: String, placeholders: Map[String, String]): String =
    // sorted key order makes cascades deterministic: if one placeholder's
    // VALUE contains another's {token}, the result no longer depends on
    // hash-map iteration order (braced tokens can't nest, so sorting is
    // only about cascade determinism, not match ambiguity)
    placeholders.toSeq.sortBy(_._1).foldLeft(query) { case (q, (k, v)) =>
      q.replace("{" + k + "}", v)
    }
}
