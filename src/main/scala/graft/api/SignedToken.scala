package graft.api

import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import com.fasterxml.jackson.databind.ObjectMapper

/** HMAC-SHA256-signed bearer tokens with expiry — the engine-agnostic
  * twin of the reference's JWT auth (AuthToken.scala:17-40: auth0
  * HMAC256, issuer claim, per-org claim, 1-hour expiry). Emits and
  * verifies standard JWS compact serialization
  * (`base64url(header).base64url(payload).base64url(sig)` with
  * `{"alg":"HS256","typ":"JWT"}`), so tokens interoperate with any JWT
  * library — implemented on the JDK's `javax.crypto.Mac` because the
  * engine carries no auth dependency.
  *
  * Verification REJECTS (returns None — the shell answers 401):
  * malformed tokens, any header `alg` other than HS256 (the classic
  * alg-confusion downgrade), a signature that does not match under a
  * constant-time compare, a missing/foreign `iss`, and `exp` at or
  * before now. On success it returns the `sub` claim — the customerId
  * the shell resolves to a [[QueryHttpApi.Tenant]].
  */
final class SignedToken(
    secret: Array[Byte],
    issuer: String = "graft",
    ttlSeconds: Long = 3600,
    now: () => Instant = () => Instant.now()) {
  require(secret.nonEmpty, "empty HMAC secret")
  require(ttlSeconds > 0, s"ttlSeconds $ttlSeconds must be positive")

  private val mapper = new ObjectMapper()
  private val enc = Base64.getUrlEncoder.withoutPadding()
  private val dec = Base64.getUrlDecoder

  private def hmac(data: String): Array[Byte] = {
    // Mac instances are not thread-safe; one per call is cheap next to
    // the HTTP round-trip
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.US_ASCII))
  }

  private def b64(json: String): String =
    enc.encodeToString(json.getBytes(StandardCharsets.UTF_8))

  /** Issue a token for `customerId`, expiring ttlSeconds from now. */
  def issue(customerId: String): String = {
    val header = b64("""{"alg":"HS256","typ":"JWT"}""")
    val payload = b64(mapper.writeValueAsString(java.util.Map.of(
      "iss", issuer,
      "sub", customerId,
      "exp", java.lang.Long.valueOf(now().getEpochSecond + ttlSeconds))))
    val signingInput = header + "." + payload
    signingInput + "." + enc.encodeToString(hmac(signingInput))
  }

  /** Verify a token: Some(customerId) iff the signature, algorithm,
    * issuer, and expiry all check out. Total — any garbage is None. */
  def verify(token: String): Option[String] =
    try {
      val parts = token.split('.')
      if (parts.length != 3) return None
      val expected = hmac(parts(0) + "." + parts(1))
      val got = dec.decode(parts(2))
      // constant-time: a byte-wise early-exit compare leaks how many
      // leading signature bytes an attacker guessed right
      if (!java.security.MessageDigest.isEqual(expected, got)) return None
      val header = mapper.readTree(
        new String(dec.decode(parts(0)), StandardCharsets.UTF_8))
      if (header.path("alg").asText() != "HS256") return None
      val claims = mapper.readTree(
        new String(dec.decode(parts(1)), StandardCharsets.UTF_8))
      if (claims.path("iss").asText() != issuer) return None
      if (!claims.path("exp").isNumber ||
          claims.path("exp").asLong() <= now().getEpochSecond) return None
      val sub = claims.path("sub").asText()
      if (sub.isEmpty) None else Some(sub)
    } catch { case _: Exception => None }

  /** The pluggable shape [[QueryHttpApi]] takes. */
  def verifier: String => Option[String] = verify
}
