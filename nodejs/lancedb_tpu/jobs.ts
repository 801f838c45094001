/**
 * Remote jobs — the TS face of the reference Job handle
 * (reference rust/lancedb/src/job.rs:16-31: status/wait/cancel) and the
 * connection-level job APIs (connection.rs:526-556), polling the
 * server's /v1/jobs endpoints.
 */

import { RestClient } from "./client.js";

export type JobStatus = "PENDING" | "RUNNING" | "SUCCEEDED" | "FAILED" | "CANCELLED";

export interface JobInfo {
  id: string;
  type: string;
  status: JobStatus;
  created_at: number;
  finished_at: number | null;
  error: string | null;
}

const TERMINAL: ReadonlySet<JobStatus> = new Set(["SUCCEEDED", "FAILED", "CANCELLED"]);

export class JobFailedError extends Error {
  constructor(
    public jobId: string,
    public info: JobInfo,
  ) {
    super(`job ${jobId} ${info.status.toLowerCase()}: ${info.error ?? ""}`);
  }
}

export class RemoteJob {
  constructor(
    private client: RestClient,
    private info: JobInfo,
  ) {}

  get id(): string {
    return this.info.id;
  }

  async refresh(): Promise<JobInfo> {
    const r = await this.client.getJson<{ job: JobInfo }>(`/v1/jobs/${this.info.id}`);
    this.info = r.job;
    return { ...this.info };
  }

  async status(): Promise<JobStatus> {
    if (!TERMINAL.has(this.info.status)) await this.refresh();
    return this.info.status;
  }

  async done(): Promise<boolean> {
    return TERMINAL.has(await this.status());
  }

  /** Poll until terminal; throws JobFailedError on FAILED/CANCELLED. */
  async wait(timeoutMs = 300_000, pollMs = 100): Promise<JobInfo> {
    const deadline = Date.now() + timeoutMs;
    for (;;) {
      const status = await this.status();
      if (status === "SUCCEEDED") return { ...this.info };
      if (status === "FAILED" || status === "CANCELLED") {
        throw new JobFailedError(this.id, this.info);
      }
      if (Date.now() > deadline) {
        throw new Error(`job ${this.id} still ${status} after ${timeoutMs}ms`);
      }
      await new Promise((r) => setTimeout(r, pollMs));
    }
  }

  async cancel(): Promise<boolean> {
    const r = await this.client.postJson<{ cancelled: boolean; job: JobInfo }>(
      `/v1/jobs/${this.info.id}/cancel`,
    );
    this.info = r.job;
    return r.cancelled;
  }
}
