/**
 * Per-request header providers — the TS face of the reference SDK's
 * header.ts (HeaderProvider / StaticHeaderProvider / OAuthHeaderProvider)
 * and of the python remote/oauth.py client-credentials source. The
 * RestClient calls every configured provider before each attempt, so a
 * provider can rotate tokens mid-retry.
 */

export abstract class HeaderProvider {
  /** Headers to merge into the outgoing request (called per attempt —
   * keep it cheap; cache inside the provider). */
  abstract headers(): Promise<Record<string, string>> | Record<string, string>;
}

/** Fixed headers known at construction (api keys, tenant ids). */
export class StaticHeaderProvider extends HeaderProvider {
  constructor(private readonly fixed: Record<string, string>) {
    super();
  }

  headers(): Record<string, string> {
    return this.fixed;
  }
}

/** Headers computed by a user callback on every request (request
 * tracking, short-lived JWTs minted elsewhere). */
export class CallbackHeaderProvider extends HeaderProvider {
  constructor(
    private readonly fn: () => Promise<Record<string, string>> | Record<string, string>,
  ) {
    super();
  }

  headers(): Promise<Record<string, string>> | Record<string, string> {
    return this.fn();
  }
}

export interface TokenResponse {
  access_token: string;
  token_type?: string;
  /** Seconds until expiry; some IdPs send it as a string, some omit it
   * (then `defaultTtlSeconds` applies). */
  expires_in?: number | string;
}

export interface OAuthConfig {
  /** Token endpoint URL (or an issuer whose /.well-known document the
   * first fetch discovers when `discover` is set). */
  tokenUrl: string;
  clientId: string;
  clientSecret: string;
  scope?: string;
  audience?: string;
  /** Refresh this many seconds before expiry (default 30; clamped to
   * half the TTL for very short-lived tokens). */
  refreshBufferSeconds?: number;
  /** TTL assumed when the IdP omits expires_in (default 3600). */
  defaultTtlSeconds?: number;
  /** Resolve tokenUrl as an issuer via OIDC discovery. */
  discover?: boolean;
}

/**
 * OAuth2 client-credentials provider: lazily fetches a bearer token,
 * caches it, and refreshes inside the configured buffer before expiry.
 * Concurrent requests share one in-flight refresh.
 */
export class OAuthHeaderProvider extends HeaderProvider {
  private token: string | null = null;
  private expiresAt = 0; // ms epoch
  private endpoint: string | null = null;
  private inflight: Promise<void> | null = null;

  constructor(private readonly cfg: OAuthConfig) {
    super();
  }

  private expired(): boolean {
    if (this.token === null) return true;
    const ttlMs = this.expiresAt - Date.now();
    const bufMs = (this.cfg.refreshBufferSeconds ?? 30) * 1000;
    return ttlMs <= Math.min(bufMs, Math.max(0, (this.expiresAt - this.fetchedAt) / 2));
  }

  private fetchedAt = 0;

  private async resolveEndpoint(): Promise<string> {
    if (this.endpoint) return this.endpoint;
    if (!this.cfg.discover) {
      this.endpoint = this.cfg.tokenUrl;
      return this.endpoint;
    }
    const issuer = this.cfg.tokenUrl.replace(/\/+$/, "");
    const resp = await fetch(`${issuer}/.well-known/openid-configuration`);
    if (!resp.ok) {
      throw new Error(`OIDC discovery failed: HTTP ${resp.status}`);
    }
    const doc = (await resp.json()) as { token_endpoint?: string };
    if (!doc.token_endpoint) {
      throw new Error("OIDC discovery document has no token_endpoint");
    }
    this.endpoint = doc.token_endpoint;
    return this.endpoint;
  }

  private async refresh(): Promise<void> {
    const url = await this.resolveEndpoint();
    const form = new URLSearchParams({
      grant_type: "client_credentials",
      client_id: this.cfg.clientId,
      client_secret: this.cfg.clientSecret,
    });
    if (this.cfg.scope) form.set("scope", this.cfg.scope);
    if (this.cfg.audience) form.set("audience", this.cfg.audience);
    const resp = await fetch(url, {
      method: "POST",
      headers: { "content-type": "application/x-www-form-urlencoded" },
      body: form.toString(),
    });
    if (!resp.ok) {
      throw new Error(`token request failed: HTTP ${resp.status}`);
    }
    const tok = (await resp.json()) as TokenResponse;
    if (!tok.access_token) throw new Error("token response has no access_token");
    let ttl = Number(tok.expires_in);
    if (!Number.isFinite(ttl) || ttl <= 0) ttl = this.cfg.defaultTtlSeconds ?? 3600;
    this.token = tok.access_token;
    this.fetchedAt = Date.now();
    this.expiresAt = this.fetchedAt + ttl * 1000;
  }

  async headers(): Promise<Record<string, string>> {
    if (this.expired()) {
      // single-flight: concurrent callers await the same refresh
      this.inflight ??= this.refresh().finally(() => {
        this.inflight = null;
      });
      await this.inflight;
    }
    return { authorization: `Bearer ${this.token}` };
  }
}

/** Merge the output of several providers in order (later wins). */
export async function resolveHeaders(
  providers: HeaderProvider[],
): Promise<Record<string, string>> {
  const out: Record<string, string> = {};
  for (const p of providers) {
    Object.assign(out, await p.headers());
  }
  return out;
}
