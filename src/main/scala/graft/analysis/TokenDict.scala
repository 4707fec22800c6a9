package graft.analysis

/** Per-task open-addressing dictionary mapping lowercased token text to
  * dense int ids WITHOUT allocating a String per occurrence: the indexing
  * hot path probes `(text, start, end)` slices with on-the-fly ASCII
  * lowercasing, and each distinct term's String materializes exactly once,
  * on the task's first sight of it. With a ~5k-term vocabulary over tens of
  * millions of turns this removes essentially every per-occurrence
  * allocation of the posting build's analysis loop (the same discipline as
  * Lucene's char[]-based TermsHash — re-expressed, not ported).
  *
  * Hashing is ALWAYS over ASCII-lowercased chars so the slice path and the
  * String path ([[idOf]], used for the norms-sidecar key, namespaced field
  * terms, and the ICU fallback's already-lowercased tokens) land the same
  * term in the same slot — a term like "data" seen first in an ASCII text
  * (slice probe) and later in a non-ASCII text (String probe) must resolve
  * to ONE id, or its postings would split across two rows. Equality is
  * lowered on the slice path and verbatim on the String path: String keys
  * that differ from a stored term only by case simply collide and store
  * separately, which is correct (field-term values are verbatim by design).
  *
  * Not thread-safe — one instance per task.
  */
final class TokenDict(initialBits: Int = 12) {
  private var bits = math.max(4, initialBits)
  private var table = newTable(1 << bits) // slot -> id, -1 empty
  private var termsArr = new Array[String](1 << math.max(2, bits - 2))
  private var hashArr = new Array[Int](termsArr.length) // id -> hash
  private var n = 0

  private def newTable(cap: Int): Array[Int] = {
    val t = new Array[Int](cap)
    java.util.Arrays.fill(t, -1)
    t
  }

  def size: Int = n
  def term(id: Int): String = termsArr(id)

  @inline private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** FNV-1a over lowercased chars — identical for a slice and for the
    * String the slice materializes to. */
  private def hashSlice(text: String, start: Int, end: Int): Int = {
    var h = 0x811c9dc5
    var i = start
    while (i < end) { h = (h ^ lower(text.charAt(i))) * 0x01000193; i += 1 }
    h
  }

  private def eqLowered(t: String, text: String, start: Int, end: Int): Boolean = {
    if (t.length != end - start) return false
    var i = 0
    while (i < t.length) {
      if (t.charAt(i) != lower(text.charAt(start + i))) return false
      i += 1
    }
    true
  }

  private def grow(): Unit = {
    bits += 1
    val t = newTable(1 << bits)
    val mask = t.length - 1
    var id = 0
    while (id < n) {
      var slot = hashArr(id) & mask
      while (t(slot) != -1) slot = (slot + 1) & mask
      t(slot) = id
      id += 1
    }
    table = t
  }

  private def insert(slot: Int, t: String, h: Int): Int = {
    val id = n
    if (id == termsArr.length) {
      termsArr = java.util.Arrays.copyOf(termsArr, id * 2)
      hashArr = java.util.Arrays.copyOf(hashArr, id * 2)
    }
    termsArr(id) = t
    hashArr(id) = h
    table(slot) = id
    n += 1
    if (n * 2 > table.length) grow()
    id
  }

  /** Lowercased materialization of the slice (allocation-free when the
    * slice is already lowercase is NOT attempted — this runs once per
    * distinct term, not per occurrence). */
  private def materialize(text: String, start: Int, end: Int): String = {
    val arr = new Array[Char](end - start)
    var i = start
    var j = 0
    while (i < end) { arr(j) = lower(text.charAt(i)); i += 1; j += 1 }
    new String(arr)
  }

  /** Id of the ASCII-lowercased content of `text[start, end)`. */
  def idOfSlice(text: String, start: Int, end: Int): Int = {
    val h = hashSlice(text, start, end)
    val mask = table.length - 1
    var slot = h & mask
    while (true) {
      val id = table(slot)
      if (id == -1) return insert(slot, materialize(text, start, end), h)
      if (hashArr(id) == h && eqLowered(termsArr(id), text, start, end)) return id
      slot = (slot + 1) & mask
    }
    -1 // unreachable
  }

  /** Id of `t` VERBATIM (hash lowered for slot agreement, equality exact).
    * Callers pass already-lowercased analyzer output or namespaced field
    * terms whose case is significant. */
  def idOf(t: String): Int = {
    val h = hashSlice(t, 0, t.length)
    val mask = table.length - 1
    var slot = h & mask
    while (true) {
      val id = table(slot)
      if (id == -1) return insert(slot, t, h)
      if (hashArr(id) == h && termsArr(id) == t) return id
      slot = (slot + 1) & mask
    }
    -1 // unreachable
  }
}

/** Reusable (id, position) output buffers for
  * [[Analyzer.analyzeIdsInto]] — one per task, grown in place. */
final class TokenSink {
  var ids: Array[Int] = new Array[Int](64)
  var poss: Array[Int] = new Array[Int](64)
  var n: Int = 0
  @inline def add(id: Int, pos: Int): Unit = {
    if (n == ids.length) {
      ids = java.util.Arrays.copyOf(ids, n * 2)
      poss = java.util.Arrays.copyOf(poss, n * 2)
    }
    ids(n) = id
    poss(n) = pos
    n += 1
  }
}
