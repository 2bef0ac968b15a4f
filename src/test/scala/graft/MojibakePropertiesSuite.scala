package graft

import graft.pipeline.TextFunctions
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the [[TextFunctions.MojibakeRepairs]] table —
  * the replace chain is plain string arithmetic, so the table's
  * invertibility contract is provable without Spark (the Column path is
  * pinned by the `p_fix_encoding` gate and the PipelineSuite fixture).
  *
  * The honest property (probed at 200k random strings before pinning):
  * for text containing NO mojibake pattern already, corrupting every
  * char through CP1252-in-UTF-8 and repairing restores it exactly, and
  * repair is a fixpoint. Text that ALREADY carries mojibake sequences
  * is excluded BY DESIGN: corrupting it produces doubly-encoded bytes,
  * and the chain may peel both layers in one pass (order-dependent) —
  * the fundamental ftfy ambiguity that "Ã“" is indistinguishable from
  * intentional text. Production semantics are one DETERMINISTIC pass;
  * what that pass does is exactly what the oracle replays.
  */
class MojibakePropertiesSuite extends AnyFunSuite {

  private val repairs = TextFunctions.MojibakeRepairs
  private val rng = new scala.util.Random(13)

  /** JVM twin of the Column fold — same fixed chain order. */
  private def repair(s: String): String =
    repairs.foldLeft(s) { case (acc, (m, f)) => acc.replace(m, f) }

  /** CP1252-in-UTF-8 corruption: UTF-8 bytes decoded leniently (the
    * Java windows-1252 / WHATWG / sloppy-cp1252 convention: undefined
    * bytes 81/8D/8F/90/9D pass through as C1 controls).
    */
  private val cp1252: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  private def corrupt(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map { b =>
      val u = b & 0xFF
      if (u < 0x80) u.toChar else cp1252.getOrElse(u, u.toChar)
    }.mkString

  // ASCII + Latin-1 supplement + the CP1252 specials: the repairable set
  private val alphabet: IndexedSeq[Char] =
    (0x20 until 0x7F).map(_.toChar) ++ (0xA0 until 0x100).map(_.toChar) ++
      cp1252.values.toIndexedSeq

  private def cleanOf(s: String): Boolean = !repairs.exists(p => s.contains(p._1))

  test("repair(corrupt(s)) == s and repair(s) == s for every mojibake-free s") {
    // every single repairable char round-trips
    alphabet.foreach { c =>
      val s = c.toString
      if (cleanOf(s)) {
        assert(repair(corrupt(s)) === s, s"char U+${c.toInt.toHexString}")
        assert(repair(s) === s)
      }
    }
    var trials = 0
    while (trials < 20000) {
      val n = rng.nextInt(13)
      val s = Array.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
      if (cleanOf(s)) {
        trials += 1
        assert(repair(corrupt(s)) === s, s"round-trip failed for ${s.map(_.toInt)}")
        assert(repair(s) === s, s"repair not a fixpoint for ${s.map(_.toInt)}")
      }
    }
  }

  test("every table entry repairs in isolation and no entry is dead") {
    repairs.foreach { case (m, f) =>
      assert(repair(m) === f, s"pattern for $f did not repair standalone")
      assert(corrupt(f) === m, s"$f does not corrupt back to its own pattern")
    }
  }

  test("two passes peel two encoding layers; the second pass is a no-op on one layer") {
    // the canonical doubly-encoded shape: café -> cafÃ© -> cafÃƒÂ©
    val cafe = "café"
    val twice = corrupt(corrupt(cafe))
    assert(twice === "cafÃƒÂ©") // cafÃƒÂ©
    assert(repair(repair(twice)) === cafe)
    assert(repair(twice) !== cafe, "one pass must NOT fully repair two layers")
    // C1-control case — the five CP1252-undefined bytes: a closing curly
    // quote's second corruption goes through Â + C1 control, covered
    // only by the C2+control rows added with fixEncoding2x
    val quote = "”"
    assert(repair(repair(corrupt(corrupt(quote)))) === quote)
    var trials = 0
    while (trials < 20000) {
      val n = rng.nextInt(13)
      val s = Array.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
      if (cleanOf(s)) {
        trials += 1
        val c2 = corrupt(corrupt(s))
        assert(repair(repair(c2)) === s, s"2x round-trip failed for ${s.map(_.toInt)}")
        // idempotence on single-layer input: pass 2 after a full repair
        // changes nothing (the fixEncoding2x safe-default claim)
        assert(repair(repair(corrupt(s))) === s,
          s"second pass not a no-op on one layer for ${s.map(_.toInt)}")
      }
    }
  }
}
