package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chunk.{ChunkWriter, Gorilla}

/** Bit-level codec properties. Deterministic seeded "property tests"
  * (plain ScalaTest; no scalatest-scalacheck bridge ships in the offline
  * cache, so randomized cases use fixed-seed java.util.Random).
  */
class GorillaSpec extends AnyFunSuite {

  private def roundtrip(ts: Array[Long], vs: Array[Double]): Unit = {
    val blob = Gorilla.encode(ts, vs)
    val (ts2, vs2) = Gorilla.decode(blob, ts.length)
    assert(ts2.toSeq == ts.toSeq)
    vs.indices.foreach { i =>
      if (vs(i).isNaN) assert(vs2(i).isNaN)
      else assert(java.lang.Double.doubleToLongBits(vs2(i)) ==
        java.lang.Double.doubleToLongBits(vs(i)), s"value $i")
    }
  }

  test("roundtrip: regular 15-min grid, slowly varying values") {
    val ts = Array.tabulate(1000)(i => 1704067200L + i * 900L)
    val vs = Array.tabulate(1000)(i => 100.0 + (i % 7) / 256.0)
    roundtrip(ts, vs)
  }

  test("roundtrip: irregular deltas incl. huge jumps and dod==bucket edges") {
    // exercise every dod bucket boundary: 0, ±63/64, ±255/256, ±2047/2048, 64-bit
    val deltas = Array(900L, 900L, 901L, 837L, 965L, 1156L, 644L, 2948L,
      852L, 3100000000L, 900L, 900L)
    val ts = deltas.scanLeft(1704067200L)(_ + _)
    val vs = Array.tabulate(ts.length)(i => math.sin(i) * 1e6)
    roundtrip(ts, vs)
  }

  test("roundtrip: NaN gaps, zeros, negatives, denormals, infinities") {
    val ts = Array.tabulate(12)(i => i * 900L)
    val vs = Array(0.0, -0.0, Double.NaN, 1.5, Double.NaN, Double.NaN,
      -1e308, Double.MinPositiveValue, Double.PositiveInfinity,
      Double.NegativeInfinity, 42.0, 42.0)
    roundtrip(ts, vs)
  }

  test("roundtrip: 500 seeded random series") {
    val rnd = new java.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      var t = math.abs(rnd.nextLong() % 4102444800L)
      val ts = Array.fill(n) { t += 1 + rnd.nextInt(100000); t }
      val vs = Array.fill(n) {
        rnd.nextInt(5) match {
          case 0 => Double.NaN
          case 1 => rnd.nextInt(1000).toDouble
          case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
            case d if d.isNaN => 0.0 // raw-bit NaNs canonicalize; skip them
            case d => d
          }
          case _ => rnd.nextDouble() * 1e6 - 5e5
        }
      }
      roundtrip(ts, vs)
    }
  }

  test("compression: regular grid + repeating values beats raw encoding") {
    val n = 10000
    val ts = Array.tabulate(n)(i => 1704067200L + i * 900L)
    val vs = Array.tabulate(n)(i => 250.0 + (i % 4) / 256.0)
    val blob = Gorilla.encode(ts, vs)
    val rawBytes = n * 16
    assert(blob.length < rawBytes / 4,
      s"blob ${blob.length}B vs raw ${rawBytes}B — expected >4x compression")
  }

  test("crc32 detects corruption") {
    val ts = Array.tabulate(100)(i => i * 900L)
    val vs = Array.tabulate(100)(_.toDouble)
    val blob = Gorilla.encode(ts, vs)
    val crc = Gorilla.crc32(blob)
    blob(blob.length / 2) = (blob(blob.length / 2) ^ 0x40).toByte
    assert(Gorilla.crc32(blob) != crc)
  }

  test("varint index roundtrip (zigzag delta encoding)") {
    import scala.collection.mutable.ArrayBuffer
    val values = Seq(0L, 1L, -1L, 127L, -128L, 300000L, -9999999999L, Long.MaxValue / 2)
    val buf = new ArrayBuffer[Byte]()
    // encode via the private-writer path indirectly: readVarLong is public,
    // so mirror the zigzag-write here
    values.foreach { vRaw =>
      var v = (vRaw << 1) ^ (vRaw >> 63)
      while ((v & ~0x7fL) != 0L) { buf += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      buf += (v & 0x7f).toByte
    }
    var pos = 0
    val decoded = values.map { _ =>
      val (v, p) = ChunkWriter.readVarLong(buf.toArray, pos)
      pos = p; v
    }
    assert(decoded == values)
  }
}
