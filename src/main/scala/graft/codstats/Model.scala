package graft.codstats

import org.apache.spark.sql.types._

/** Data model for the match-stats domain (SURVEY.md §1).
  *
  * The match document schema mirrors the fields the reference consumes from
  * the Activision API (`/root/reference/parser/parse_matches.sh:619-671`,
  * §1.3) — declared explicitly, never inferred: the null-default semantics
  * (`ifnull(...,0)` / `-1`) are ours to apply in [[Normalize]], not the
  * inferencer's.
  *
  * Dimensions are code-as-data `Dataset`s (the reference models them as
  * inline VALUES-CTE views, `parse_matches.sh:100-198`). Production loads
  * them from config JSON ([[Dims.gameModesFromJson]]); a small seed covers
  * tests and defaults. Dimension DATA is deployment config, not engine
  * code — the engine only fixes the shape.
  */
object Model {

  /** players.json entry after account explosion (reference
    * `config/players.json.example`; one logical player may merge several
    * platform accounts — fetch_matches.ts:28-36). */
  case class Player(player_uno_id: String, player_id: String, is_core: Boolean)

  /** Game-mode dimension row (vw_game_modes shape, parse_matches.sh:100-156). */
  case class GameMode(id: String, category: String, display_name: String,
                      wz_track_stats: Boolean, is_stimulus: Boolean)

  /** Season dimension row — [start, end) ISO instants; 'lifetime' overlaps
    * everything on purpose (parse_matches.sh:158-184). */
  case class Season(season_id: String, start_ts: java.sql.Timestamp,
                    end_ts: java.sql.Timestamp)

  /** Engine thresholds (vw_settings, parse_matches.sh:186-198). */
  case class Settings(monsterKills: Int = 8, sessionGapSeconds: Long = 7200L)

  /** Per-(match, player) document schema — only fields the pipeline reads.
    * All stat fields nullable; defaults applied in Normalize. */
  val matchSchema: StructType = StructType(Seq(
    StructField("matchID", StringType),
    StructField("utcStartSeconds", LongType),
    StructField("utcEndSeconds", LongType),
    StructField("gameType", StringType),
    StructField("mode", StringType),
    StructField("playerCount", IntegerType),
    StructField("teamCount", IntegerType),
    StructField("player", StructType(Seq(
      StructField("uno", StringType)))),
    StructField("playerStats", StructType(Seq(
      StructField("score", DoubleType),
      StructField("scorePerMinute", DoubleType),
      StructField("kills", DoubleType),
      StructField("deaths", DoubleType),
      StructField("damageDone", DoubleType),
      StructField("damageTaken", DoubleType),
      StructField("gulagKills", DoubleType),
      StructField("gulagDeaths", DoubleType),
      StructField("teamPlacement", DoubleType),
      StructField("kdRatio", DoubleType),
      StructField("distanceTraveled", DoubleType),
      StructField("headshots", DoubleType),
      StructField("objectiveBrCacheOpen", DoubleType),
      StructField("objectiveReviver", DoubleType),
      StructField("objectiveBrDownEnemyCircle1", DoubleType),
      StructField("objectiveBrDownEnemyCircle2", DoubleType),
      StructField("objectiveBrDownEnemyCircle3", DoubleType),
      StructField("objectiveBrDownEnemyCircle4", DoubleType),
      StructField("objectiveBrDownEnemyCircle5", DoubleType),
      StructField("objectiveBrDownEnemyCircle6", DoubleType),
      StructField("objectiveDestroyedVehicleLight", DoubleType),
      StructField("objectiveDestroyedVehicleMedium", DoubleType),
      StructField("objectiveDestroyedVehicleHeavy", DoubleType))))))

  /** Seed game modes: representative of the dimension's SHAPE (category
    * buckets, tracked flag, stimulus flag). Full deployments extend via
    * config. */
  val seedGameModes: Seq[GameMode] = Seq(
    GameMode("br_brsolo", "wz_solo", "BR Solo", wz_track_stats = true, is_stimulus = false),
    GameMode("br_brduos", "wz_duos", "BR Duos", wz_track_stats = true, is_stimulus = false),
    GameMode("br_brtrios", "wz_trios", "BR Trios", wz_track_stats = true, is_stimulus = false),
    GameMode("br_brquads", "wz_quads", "BR Quads", wz_track_stats = true, is_stimulus = false),
    GameMode("br_mini_rebirth", "wz_resurgence", "Rebirth Mini", wz_track_stats = false, is_stimulus = true),
    GameMode("br_dmz_plunder", "wz_plunder", "Plunder", wz_track_stats = false, is_stimulus = false))

  val seedSeasons: Seq[(String, String, String)] = Seq(
    ("s1", "2020-03-01T00:00:00Z", "2020-06-01T00:00:00Z"),
    ("s2", "2020-06-01T00:00:00Z", "2020-09-01T00:00:00Z"),
    ("lifetime", "2020-01-01T00:00:00Z", "2100-01-01T00:00:00Z"))
}

/** Config-file loaders for the dimension tables (deployment data, engine
  * shape — reference seeds these from players.json / inline VALUES). */
object Dims {
  import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

  /** JSON lines of {id, category, display_name, wz_track_stats, is_stimulus}. */
  def gameModesFromJson(spark: SparkSession, path: String): Dataset[Model.GameMode] =
    spark.read.schema(Encoders.product[Model.GameMode].schema).json(path)
      .as(Encoders.product[Model.GameMode])

  /** players.json shape: [{name, isCore?, accounts:[{unoId,...}]}] →
    * one Player row per account (reference fetch_matches.ts:28-36 /
    * parse_matches.sh:546-564: lower-cased name, default non-core). */
  def playersFromJson(spark: SparkSession, path: String): Dataset[Model.Player] = {
    import org.apache.spark.sql.functions._
    spark.read.json(path)
      .select(lower(col("name")).as("player_id"),
              coalesce(col("isCore"), lit(false)).as("is_core"),
              explode(col("accounts")).as("acct"))
      .select(col("acct.unoId").as("player_uno_id"), col("player_id"), col("is_core"))
      .as(Encoders.product[Model.Player])
  }
}
