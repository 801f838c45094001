/**
 * HTTP transport for the lancedb-tpu query server.
 *
 * Mirrors the reference TypeScript SDK's remote client behavior
 * (reference nodejs/lancedb + rust remote/client.rs): JSON request
 * bodies, Arrow IPC stream responses, x-request-id propagation, and
 * bounded retries with exponential backoff + jitter on 409/429/5xx.
 */

/** TLS / mTLS identity — the TS face of the reference ClientConfig TLS
 * options (reference rust remote/client.rs:66-285) and of the python
 * `TlsConfig`. Requires the optional `undici` package for the custom
 * dispatcher (`npm i undici`). */
export interface TlsConfig {
  /** PEM CA bundle pinning the server's trust root. */
  ca?: string;
  /** PEM client certificate (mTLS). */
  cert?: string;
  /** PEM client private key (mTLS). */
  key?: string;
  /** Set false to skip certificate verification (tests only). */
  rejectUnauthorized?: boolean;
}

import { HeaderProvider, resolveHeaders } from "./header.js";

/** Observation hook for request metrics (otel.ts adapts this onto an
 * OpenTelemetry meter; reference nodejs/lancedb/otel.ts). */
export interface RequestObserver {
  onRequest(info: {
    method: string;
    path: string;
    status: number | "error";
    durationMs: number;
    attempt: number;
    requestId: string;
  }): void;
}

export interface ClientConfig {
  /** Base URL of the query server, e.g. http://127.0.0.1:8787 */
  baseUrl: string;
  /** Total attempts per request (default 3). */
  retries?: number;
  /** Initial backoff in ms (default 100; doubles per retry, +-25% jitter). */
  backoffMs?: number;
  /** Per-request timeout in ms (default 30000). */
  timeoutMs?: number;
  /** Extra headers (e.g. authorization). */
  headers?: Record<string, string>;
  /** Dynamic per-request headers (OAuth bearer rotation etc. —
   * header.ts). Resolved on every attempt, after `headers`. */
  headerProviders?: HeaderProvider[];
  /** TLS / mTLS options for https servers. */
  tls?: TlsConfig;
  /** Metrics hook observing every request attempt (otel.ts). */
  observer?: RequestObserver;
}

const RETRYABLE = new Set([409, 429, 500, 502, 503, 504]);

export class HttpError extends Error {
  constructor(
    public status: number,
    message: string,
    public requestId?: string,
  ) {
    super(message);
  }
}

export class RestClient {
  private cfg: {
    baseUrl: string;
    retries: number;
    backoffMs: number;
    timeoutMs: number;
    headers: Record<string, string>;
    headerProviders: HeaderProvider[];
    tls?: TlsConfig;
    observer?: RequestObserver;
  };
  private dispatcher: unknown | null | undefined;

  constructor(cfg: ClientConfig) {
    this.cfg = {
      baseUrl: cfg.baseUrl.replace(/\/+$/, ""),
      retries: cfg.retries ?? 3,
      backoffMs: cfg.backoffMs ?? 100,
      timeoutMs: cfg.timeoutMs ?? 30_000,
      headers: cfg.headers ?? {},
      headerProviders: cfg.headerProviders ?? [],
      tls: cfg.tls,
      observer: cfg.observer,
    };
  }

  /** undici Agent carrying the TLS identity; built once, lazily, and
   * only when TLS options are present. */
  private async getDispatcher(): Promise<unknown | null> {
    if (this.dispatcher !== undefined) return this.dispatcher;
    const tls = this.cfg.tls;
    if (!tls || !this.cfg.baseUrl.startsWith("https")) {
      this.dispatcher = null;
      return null;
    }
    try {
      const { Agent } = await import("undici");
      this.dispatcher = new Agent({
        connect: {
          ca: tls.ca,
          cert: tls.cert,
          key: tls.key,
          rejectUnauthorized: tls.rejectUnauthorized ?? true,
        },
      });
    } catch {
      throw new Error(
        "TLS client options require the optional 'undici' package: npm i undici",
      );
    }
    return this.dispatcher;
  }

  private async send(
    method: "GET" | "POST",
    path: string,
    body?: Uint8Array | object,
    contentType?: string,
  ): Promise<Response> {
    const url = `${this.cfg.baseUrl}${path}`;
    const requestId = crypto.randomUUID();
    let payload: BodyInit | undefined;
    let ctype = contentType;
    if (body !== undefined) {
      if (body instanceof Uint8Array) {
        payload = body as unknown as BodyInit;
        ctype = ctype ?? "application/vnd.apache.arrow.stream";
      } else {
        payload = JSON.stringify(body);
        ctype = ctype ?? "application/json";
      }
    }
    let lastErr: unknown;
    for (let attempt = 0; attempt < this.cfg.retries; attempt++) {
      const ctl = new AbortController();
      const timer = setTimeout(() => ctl.abort(), this.cfg.timeoutMs);
      const t0 = Date.now();
      const observe = (status: number | "error") =>
        this.cfg.observer?.onRequest({
          method,
          path,
          status,
          durationMs: Date.now() - t0,
          attempt,
          requestId,
        });
      try {
        const dispatcher = await this.getDispatcher();
        // dynamic providers resolve per attempt so rotated tokens apply
        const dynamic = this.cfg.headerProviders.length
          ? await resolveHeaders(this.cfg.headerProviders)
          : {};
        const resp = await fetch(url, {
          method,
          body: payload,
          signal: ctl.signal,
          // node fetch extension: undici dispatcher carries TLS identity
          ...(dispatcher ? ({ dispatcher } as object) : {}),
          headers: {
            ...this.cfg.headers,
            ...dynamic,
            "x-request-id": requestId,
            ...(ctype ? { "content-type": ctype } : {}),
          },
        });
        observe(resp.status);
        if (resp.ok) return resp;
        if (!RETRYABLE.has(resp.status) || attempt === this.cfg.retries - 1) {
          const text = await resp.text();
          let message = text;
          try {
            message = JSON.parse(text).error ?? text;
          } catch {
            /* not json */
          }
          throw new HttpError(resp.status, message, requestId);
        }
        lastErr = new HttpError(resp.status, `retryable ${resp.status}`);
      } catch (e) {
        if (!(e instanceof HttpError)) observe("error");
        if (e instanceof HttpError && !RETRYABLE.has(e.status)) throw e;
        lastErr = e;
        if (attempt === this.cfg.retries - 1) throw e;
      } finally {
        clearTimeout(timer);
      }
      const base = this.cfg.backoffMs * 2 ** attempt;
      const jitter = base * (0.75 + Math.random() * 0.5);
      await new Promise((r) => setTimeout(r, jitter));
    }
    throw lastErr;
  }

  async getJson<T>(path: string): Promise<T> {
    const r = await this.send("GET", path);
    return (await r.json()) as T;
  }

  async postJson<T>(path: string, body: object = {}): Promise<T> {
    const r = await this.send("POST", path, body);
    return (await r.json()) as T;
  }

  async postForArrow(path: string, body: object = {}): Promise<Uint8Array> {
    const r = await this.send("POST", path, body);
    return new Uint8Array(await r.arrayBuffer());
  }

  async postArrow<T>(path: string, ipc: Uint8Array): Promise<T> {
    const r = await this.send("POST", path, ipc);
    return (await r.json()) as T;
  }
}
