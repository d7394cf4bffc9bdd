package graft

import graft.multimodal.Multimodal

/** Shared synthetic-video fixture: a "shot" like real footage — one base
  * scene plus tiny per-frame noise, so per-frame aHash bits are stable
  * across the shot, which is exactly what the majority-vote fingerprint
  * exploits (uncorrelated random frames would sit at the vote boundary
  * on many bits and defeat ANY per-frame scheme). One definition, so
  * every suite tests the same notion of "near-dup shot". */
object MediaFixtures {

  def shot(rnd: scala.util.Random, nFrames: Int,
      side: Int = 8): Array[Array[Array[(Int, Int, Int)]]] = {
    val scene = Array.fill(side, side)(
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    Array.fill(nFrames)(scene.map(_.map { case (r, g, b) =>
      def j(v: Int) = math.max(0, math.min(255, v + rnd.nextInt(5) - 2))
      (j(r), j(g), j(b))
    }))
  }

  def encShot(fs: Array[Array[Array[(Int, Int, Int)]]],
      side: Int = 8): Array[Byte] =
    Multimodal.encodeAviDib(side, side,
      fs.toSeq.map(px => (x: Int, y: Int) => px(y)(x)))

  def randomFrame(rnd: scala.util.Random,
      side: Int = 8): Array[Array[(Int, Int, Int)]] =
    Array.fill(side, side)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
}
