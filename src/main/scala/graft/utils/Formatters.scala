package graft.utils

/** Display formatters, mirroring de_polars/utils/formatters.py. Pure. */
object Formatters {

  /** `$1,234.57` (formatters.py currency path). */
  def currency(v: Double): String = f"$$${v}%,.2f"

  /** `12.3%` with one decimal. */
  def percent(v: Double): String = f"${v}%.1f%%"

  /** `1.2 GB`-style humanized bytes. */
  def bytesHuman(b: Long): String = {
    val units = Seq("B", "KB", "MB", "GB", "TB", "PB")
    var v = b.toDouble
    var i = 0
    while (v >= 1024.0 && i < units.size - 1) { v /= 1024.0; i += 1 }
    if (i == 0) s"$b B" else f"$v%.1f ${units(i)}"
  }

  /** Large-number compaction: 1.2K / 3.4M / 5.6B. */
  def compact(v: Double): String = {
    val a = math.abs(v)
    if (a >= 1e9) f"${v / 1e9}%.1fB"
    else if (a >= 1e6) f"${v / 1e6}%.1fM"
    else if (a >= 1e3) f"${v / 1e3}%.1fK"
    else f"$v%.1f"
  }
}
