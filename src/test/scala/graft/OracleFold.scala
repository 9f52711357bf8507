package graft

import graft.model.{ChangeEvent, TranscriptTurn}

/** Ground-truth oracle: the trivially-correct sequential fold the
  * distributed engine must be equivalent to (FIXTURES.md §4). Applies
  * events in (offset, partition) order:
  *
  *   insert/upsert(after) => state(key) = after
  *   update(after)        => state(key) = after only if key exists
  *   delete(conv, turn)   => state -= key
  *   delete(conv, null)   => state --= all keys of conv (series delete)
  *
  * Semantics pinned by the reference: upsert replay
  * (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/JdbcDbWriterTest.java:1573-1770`),
  * update drops unmatched (`:2189-2413`), series delete (README.md:126-137).
  */
object OracleFold {

  type State = Map[(String, Int), TranscriptTurn]

  def applyOne(state: State, e: ChangeEvent): State = e.op match {
    case "insert" | "upsert" =>
      state + ((e.conv_id, e.turn_idx.get) -> e.after.get)
    case "update" =>
      val k = (e.conv_id, e.turn_idx.get)
      if (state.contains(k)) state + (k -> e.after.get) else state
    case "delete" =>
      e.turn_idx match {
        case Some(t) => state - ((e.conv_id, t))
        case None    => state.filter { case ((c, _), _) => c != e.conv_id }
      }
    case other => throw new IllegalArgumentException(s"bad op $other")
  }

  def finalState(events: Seq[ChangeEvent], init: State = Map.empty): State =
    events.sortBy(e => (e.offset, e.partition)).foldLeft(init)(applyOne)

  /** Sorted rows for row-for-row comparison. */
  def rows(state: State): Seq[TranscriptTurn] =
    state.values.toSeq.sortBy(t => (t.conv_id, t.turn_idx))
}
