package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IP address classification as pure Column expressions (codegen-friendly,
  * no UDFs): re-expresses the reference's `_is_external`
  * (/root/reference/src/audit/collectors/network_mapper.py:186-238):
  * RFC1918 / loopback / link-local / unspecified / IPv6-internal ⇒
  * internal; everything else external.
  */
object Ip {

  private def octet(ip: Column, i: Int): Column =
    split(ip, "\\.").getItem(i - 1).cast("int")

  /** True when the address is a syntactically valid dotted-quad IPv4. */
  def isIpv4(ip: Column): Column =
    ip.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$") &&
      (1 to 4).map(i => octet(ip, i) <= 255).reduce(_ && _)

  /** Internal/private per the reference's rules. Non-IPv4 strings: the
    * IPv6 cases it treats as internal (::, ::1, fe80:, fc/fd ULA), else
    * external.
    */
  def isInternal(ip: Column): Column = {
    val o1 = octet(ip, 1)
    val o2 = octet(ip, 2)
    val v4Internal =
      (o1 === 10) ||
        (o1 === 172 && o2.between(16, 31)) ||
        (o1 === 192 && o2 === 168) ||
        (o1 === 127) ||
        (o1 === 169 && o2 === 254) ||
        (o1 === 0)
    val lower6 = lower(ip)
    val v6Internal =
      lower6 === "::" || lower6 === "::1" ||
        lower6.startsWith("fe80") || lower6.startsWith("fc") ||
        lower6.startsWith("fd")
    when(isIpv4(ip), v4Internal).otherwise(v6Internal)
  }

  def isExternal(ip: Column): Column = !isInternal(ip)
}
